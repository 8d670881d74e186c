"""Command-line entry point.

The reference's app layer is a hardcoded ``main()``
(``clMVDE/clMVDE.cpp:12-43``) wired to ``data.txt``.  This CLI keeps the
same contract (an image-list file drives a full pipeline run) and adds what
the reference lacked: config files, flag overrides, stage artifact dumps,
and checkpointing.

Usage:
    python -m cl_multiview_stereo_tpu.cli run data.txt \
        --config cfg.json --set min_disp=10 --set max_disp=100 \
        --out results/ --dump-stages --cross-check
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cl-mvs-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the full MVS pipeline on an image list")
    run.add_argument("image_list", help="newline-separated image paths (data.txt format)")
    run.add_argument("--config", help="JSON settings file (SystemSettings fields)")
    run.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                     help="override a settings field")
    run.add_argument("--out", default="results", help="output directory")
    run.add_argument("--dump-stages", action="store_true",
                     help="write per-stage PNG artifacts (reference results/ tree)")
    run.add_argument("--checkpoint", action="store_true",
                     help="save stage arrays as npz for resume/inspection")
    run.add_argument("--cross-check", action="store_true",
                     help="enable the cross-view fusion vote (the reference's "
                          "disabled-but-intended path)")
    run.add_argument("--ply", action="store_true",
                     help="export the fused point cloud as binary PLY")

    args = ap.parse_args(argv)

    from cl_multiview_stereo_tpu.config import SystemSettings
    from cl_multiview_stereo_tpu.io.images import load_image_array, save_gray_png
    from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline
    from cl_multiview_stereo_tpu.utils import artifacts

    s = SystemSettings.from_json(args.config) if args.config else SystemSettings()
    if args.set:
        s = s.replace(**_parse_overrides(args.set))

    rgb = load_image_array(args.image_list, s.view_num)
    v, h, w = rgb.shape[:3]
    print(f"loaded {v} views of {w}x{h}")

    pipe = MVSPipeline.create(w, h, s, cross_check=args.cross_check)
    t0 = time.perf_counter()
    art = pipe.run(rgb)
    import jax

    jax.block_until_ready(art.disp_full)
    dt = time.perf_counter() - t0
    print(f"pipeline done in {dt:.2f}s ({v * h * w / dt / 1e6:.1f} MP/s incl. compile)")

    os.makedirs(args.out, exist_ok=True)
    lo, hi = float(s.min_disp), float(s.max_disp)
    import numpy as np

    for view in range(v):
        save_gray_png(
            os.path.join(args.out, artifacts.STAGE_DIRS["fusion"], f"disp_{view}.png"),
            np.asarray(art.disp_full[view]), lo, hi,
        )
    if args.dump_stages:
        from cl_multiview_stereo_tpu.io.images import draw_segmentation_lines, save_png

        overlay = draw_segmentation_lines(rgb, np.asarray(art.labels))
        for view in range(v):
            save_png(
                os.path.join(args.out, "0- segmentation", f"seg_{view}.png"),
                overlay[view],
            )
        artifacts.dump_stage_pngs(args.out, "disp_init", art.disp_init, lo, hi)
        artifacts.dump_stage_pngs(args.out, "flatness", art.flatness[..., 0], 0.0, 1.0)
        artifacts.dump_stage_pngs(args.out, "sm", art.state.sm, 0.0, 1.0)
        artifacts.dump_stage_pngs(args.out, "cs", art.state.cs, 0.0, 1.0)
        artifacts.dump_stage_pngs(args.out, "propagate", art.state.d, lo, hi)
    if args.ply:
        from cl_multiview_stereo_tpu.io.pointcloud import (
            disparity_to_points,
            save_ply,
        )

        pts, cols = disparity_to_points(
            np.asarray(art.disp_full), rgb, s.array_width, s.bl_ratio
        )
        save_ply(os.path.join(args.out, "fused.ply"), pts, cols)
        print(f"point cloud: {pts.shape[0]} points")
    if args.checkpoint:
        artifacts.save_checkpoint(
            os.path.join(args.out, "pipeline_state.npz"),
            labels=art.labels,
            center=art.spmap.center,
            color=art.spmap.color,
            disp_init=art.disp_init,
            state_d=art.state.d,
            state_sm=art.state.sm,
            state_cs=art.state.cs,
            state_n=art.state.n,
            disp_full=art.disp_full,
        )
    print(f"results written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
