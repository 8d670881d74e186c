"""Bisect the full-scale strips depth-init crash: AOT memory analysis, then
axis-only (h, v) and full runs.  Run: python -u tools/probe_strips_bisect.py [mode]
mode: mem | h | v | hv | full  (default mem)"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import (
    DerivedGeometry, SlicParams, SystemSettings, build_disp_levels,
)
from cl_multiview_stereo_tpu.io.images import load_image_array
from cl_multiview_stereo_tpu.ops import cost_volume, slic, superpixel
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mem"
    s = SystemSettings()
    rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
    if len(sys.argv) > 2:  # downsample factor
        f = int(sys.argv[2])
        rgb = rgb[:, ::f, ::f]
    h, w = rgb.shape[1:3]
    geom = DerivedGeometry.create(w, h, s)
    lab = rgb_to_lab(jnp.asarray(rgb))
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    step = superpixel.extent_step(extent)
    dl = build_disp_levels(s)
    dl_t = tuple(float(d) for d in dl)
    jax.block_until_ready(step)

    nh, nv = {"h": (1, 0), "v": (0, 1), "hv": (1, 1)}.get(mode, (1, 1))
    # hv mode: restrict to axis deltas by monkey-free call: strips falls to
    # dense only for exotic deltas, so use (neib_hor, neib_ver) combos; the
    # full diag test is mode=full.
    if mode == "mem":
        fn = jax.jit(
            lambda l, c, st: cost_volume.superpixel_cost_volume_strips(
                l, c, st, dl_t, s.array_width, s.bl_ratio, 1, 1
            )
        )
        t0 = time.time()
        comp = fn.lower(lab, spmap.center, step).compile()
        ma = comp.memory_analysis()
        gb = 1024.0 ** 3
        print(f"compile_s={time.time()-t0:.0f} temp_gb={ma.temp_size_in_bytes/gb:.2f} "
              f"arg_gb={ma.argument_size_in_bytes/gb:.2f} code_mb={ma.generated_code_size_in_bytes/2**20:.0f}",
              flush=True)
        return
    if mode == "hv":
        for nh_, nv_ in ((1, 0), (0, 1)):
            t0 = time.time()
            out = cost_volume.superpixel_cost_volume_strips(
                lab, spmap.center, step, dl_t, s.array_width, s.bl_ratio,
                nh_, nv_,
            )
            val = float(jnp.sum(out))
            print(f"axis ({nh_},{nv_}): ok sum={val:.3e} {time.time()-t0:.0f}s",
                  flush=True)
        return
    t0 = time.time()
    out = cost_volume.superpixel_cost_volume_strips(
        lab, spmap.center, step, dl_t, s.array_width, s.bl_ratio, nh, nv,
    )
    val = float(jnp.sum(out))
    print(f"mode={mode}: ok sum={val:.3e} {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
