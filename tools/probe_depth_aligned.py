"""Time depth-init dense vs strips (round-5 aligned-kernel axis classes +
dense diagonals) at the reference scene, scan-chained (memoization-proof).

Run: python -u tools/probe_depth_aligned.py [dense|strips|both]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import (
    DerivedGeometry, SlicParams, SystemSettings, build_disp_levels,
    build_view_subsets,
)
from cl_multiview_stereo_tpu.io.images import load_image_array
from cl_multiview_stereo_tpu.ops import cost_volume, slic, superpixel
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    s = SystemSettings()
    rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
    h, w = rgb.shape[1:3]
    geom = DerivedGeometry.create(w, h, s)
    disp_levels = build_disp_levels(s)
    view_subset_np, subset_num_np = build_view_subsets(s)
    lab = rgb_to_lab(jnp.asarray(rgb))
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    jax.block_until_ready(extent)
    vs = jnp.asarray(view_subset_np)
    sn = jnp.asarray(subset_num_np)

    methods = ["dense", "strips"] if which == "both" else [which]
    for method in methods:
        @jax.jit
        def run(seed, lab, centers, ext):
            def body(carry, k):
                d = cost_volume.initial_depth_estimation(
                    lab + (carry + k) * 1e-7, centers, ext, disp_levels,
                    vs, sn, s.array_width, s.bl_ratio, method=method,
                    neib_hor=s.neib_hor, neib_ver=s.neib_ver,
                )
                return carry + jnp.mean(d), None

            c, _ = jax.lax.scan(body, seed, jnp.arange(3, dtype=jnp.float32))
            return c

        t0 = time.time()
        v0 = float(run(jnp.float32(0.0), lab, spmap.center, extent))
        print(f"{method}: compile+run {time.time()-t0:.0f}s sum={v0:.4f}",
              flush=True)
        ts = []
        for s_ in (1.0, 2.0):
            t0 = time.perf_counter()
            float(run(jnp.float32(s_), lab, spmap.center, extent))
            ts.append(time.perf_counter() - t0)
        print(f"{method}: {min(ts)/3*1e3:.0f} ms/call", flush=True)


if __name__ == "__main__":
    main()
