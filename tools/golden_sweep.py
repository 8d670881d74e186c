"""Golden-config recovery sweep for the depth-init goldens (VERDICT r4 #5).

Round-5 discovery (gray-level set analysis, no chip needed): the
``1- initialize disparity/initD_dev*.png`` goldens are HETEROGENEOUS —
views 0-8 hold exactly the 31 gray levels of a 30..60 STEP-1 ladder while
views 9-14 hold the 46 levels of a 30..60 STEP-2/3 ladder.  They are two
different experiment runs saved into one directory (the committed code
cannot even build a fractional ladder — ``pipeline.cpp:121-124`` uses an
int ``inc``), which is why a single-config comparison plateaued at 9.4%.

This sweep scores each golden SUBSET against its own ladder, over the
config axes the experiments plausibly varied (bl_ratio, connectivity).

Run on the chip: python tools/golden_sweep.py [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.golden_parity import (  # noqa: E402
    REF, bar_settings, compare, load_bar_images, load_png, quantize,
)


def run_refine_sweep(results: dict) -> None:
    """Bar-scene refined-state parity vs '7- propagate' change3 (the notes'
    best WITHOUT connectivity) and change4_conne (best WITH)."""
    import jax

    from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline

    rgb = load_bar_images()
    for conn, golden in ((False, "change3"), (True, "change4_conne")):
        s = bar_settings().replace(enforce_connectivity=conn)
        pipe = MVSPipeline.create(1920, 1080, s)
        art = jax.block_until_ready(pipe.jitted()(rgb))
        labels = np.asarray(art.labels)
        d = np.asarray(art.state.d)
        aggs = ([], [])
        for k in range(15):
            ours, _ = quantize(d[k].reshape(-1)[labels[k]])
            gold = load_png(f"{REF}/results/7- propagate/{golden} {k}.png")
            aggs[0].append(ours)
            aggs[1].append(gold)
        allc = compare(np.stack(aggs[0]), np.stack(aggs[1]))
        key = f"refine conn={conn} vs {golden}"
        results[key] = allc
        print(f"{key:44s} agree<=1q {allc['agree_tol']:.3f} "
              f"mean|q| {allc['mean_abs_quanta']:.1f}", flush=True)


def run_fusion_sweep(results: dict) -> None:
    """Beer-Garden full-pipeline parity vs '8- Fusion/fus4 *' under the
    connectivity axis (the notes tie the late experiments to it)."""
    import jax

    from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline
    from tools.golden_parity import load_beer_garden

    rgb = load_beer_garden()
    from cl_multiview_stereo_tpu.config import SystemSettings

    for conn in (False, True):
        s = SystemSettings().replace(enforce_connectivity=conn)
        pipe = MVSPipeline.create(1920, 1080, s)
        art = jax.block_until_ready(pipe.jitted()(rgb))
        disp_full = np.asarray(art.disp_full)
        aggs = ([], [])
        for k in range(9):
            ours, _ = quantize(disp_full[k])
            gold = load_png(f"{REF}/results/8- Fusion/fus4 {k}.png")
            aggs[0].append(ours)
            aggs[1].append(gold)
        allc = compare(np.stack(aggs[0]), np.stack(aggs[1]))
        key = f"fusion conn={conn} vs fus4"
        results[key] = allc
        print(f"{key:44s} agree<=1q {allc['agree_tol']:.3f} "
              f"mean|q| {allc['mean_abs_quanta']:.1f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--stage", default="init",
                    choices=["init", "refine", "fusion", "all"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cl_multiview_stereo_tpu.config import (
        SlicParams, build_view_subsets,
    )
    from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline
    from cl_multiview_stereo_tpu.ops import cost_volume, slic, superpixel
    from cl_multiview_stereo_tpu.ops.color import rgb_to_lab

    ladder_1 = np.arange(30.0, 60.0 + 0.5, 1.0, dtype=np.float32)
    ladder_23 = np.asarray(
        [30.0 + k * (np.float32(2.0) / 3.0) for k in range(46)], np.float32
    )

    # Scene forensics (round 5): initD_dev0..8 are a BEER-GARDEN run
    # (9 views, step-1 ladder) OVERWRITING the first 9 files of an older
    # 15-view BAR run whose views 9..14 survive (step-2/3 ladder) — the
    # directory is two scenes, not one.
    from cl_multiview_stereo_tpu.config import SystemSettings
    from tools.golden_parity import load_beer_garden

    results = {}
    if args.stage in ("refine", "all"):
        run_refine_sweep(results)
    if args.stage in ("fusion", "all"):
        run_fusion_sweep(results)
    if args.stage not in ("init", "all"):
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=2)
        return

    def score(lab, labels_np, centers, extent, s, bl, ladder, views, tag,
              view_subset_np, subset_num_np):
        disp = np.asarray(
            cost_volume.initial_depth_estimation(
                lab, centers, extent, ladder,
                jnp.asarray(view_subset_np), jnp.asarray(subset_num_np),
                s.array_width, bl, method="dense",
                neib_hor=s.neib_hor, neib_ver=s.neib_ver,
            )
        )
        stats, aggs = {}, ([], [])
        for our_k, gold_k in views:
            d_px = disp[our_k].reshape(-1)[labels_np[our_k]]
            ours, _ = quantize(d_px)
            gold = load_png(
                f"{REF}/results/1- initialize disparity/initD_dev{gold_k}.png"
            )
            aggs[0].append(ours)
            aggs[1].append(gold)
            stats[f"view{gold_k}"] = compare(ours, gold)["agree_tol"]
        allc = compare(np.stack(aggs[0]), np.stack(aggs[1]))
        results[tag] = {**allc, "per_view": stats}
        print(f"{tag:52s} agree<=1q {allc['agree_tol']:.3f} "
              f"mean|q| {allc['mean_abs_quanta']:.1f}", flush=True)

    def seg_run(rgb, s):
        pipe = MVSPipeline.create(1920, 1080, s)
        geom = pipe.geom

        @jax.jit
        def seg(rgb):
            lab = rgb_to_lab(jnp.asarray(rgb))
            labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
            extent = superpixel.superpixel_extent(labels, spmap.center, geom)
            return lab, labels, spmap.center, extent

        lab, labels, centers, extent = jax.block_until_ready(seg(rgb))
        return lab, np.asarray(labels), centers, extent

    # --- Beer-Garden vs initD_dev0..8 (the committed config's scene) -----
    s_bg = SystemSettings()
    lab, labels_np, centers, extent = seg_run(load_beer_garden(), s_bg)
    vs_bg = build_view_subsets(s_bg)
    for bl in (s_bg.bl_ratio, 1.0):
        score(lab, labels_np, centers, extent, s_bg, bl, ladder_1,
              [(k, k) for k in range(9)], f"BG step1 bl={bl:.4f}", *vs_bg)

    # --- Bar views 9..14 vs the older run (step-2/3 ladder) --------------
    s_bar = bar_settings()
    lab, labels_np, centers, extent = seg_run(load_bar_images(), s_bar)
    vs_bar = build_view_subsets(s_bar)
    for bl in (0.625, s_bar.bl_ratio, 1.0):
        score(lab, labels_np, centers, extent, s_bar, bl, ladder_23,
              [(k, k) for k in range(9, 15)], f"Bar step2/3 bl={bl:.4f}",
              *vs_bar)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
