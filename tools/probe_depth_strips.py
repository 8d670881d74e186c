"""Time the strip-gather depth-init vs the dense shift-plane form at the
reference config (9 views, 1080p, 31 hypotheses) with the scan-chained
harness.  Run: python -u tools/probe_depth_strips.py"""

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


def scan_time(fn, *args, iters=6, label=""):
    @jax.jit
    def run(seed, *a):
        def body(carry, k):
            out = fn(*a, carry * 0 + seed + k)
            return carry + jnp.mean(out).astype(jnp.float32), None

        c, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.float32)
        )
        return c

    float(run(jnp.float32(0.0), *args))
    ts = []
    for s_ in (1.0, 2.0):
        t0 = time.perf_counter()
        float(run(jnp.float32(s_), *args))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / iters
    print(f"{label:40s} {t*1e3:9.1f} ms", flush=True)
    return t


def main():
    s = SystemSettings()
    rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
    h, w = rgb.shape[1:3]
    geom = DerivedGeometry.create(w, h, s)
    lab = rgb_to_lab(jnp.asarray(rgb))
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    step = superpixel.extent_step(extent)
    dl = build_disp_levels(s)
    dl_t = tuple(float(d) for d in dl)
    max_abs = float(np.max(np.abs(dl)))
    jax.block_until_ready(step)

    scan_time(
        lambda l, c, st, k: cost_volume.superpixel_cost_volume_dense(
            l, c, st + k * 1e-6, jnp.asarray(dl, jnp.float32),
            s.array_width, s.bl_ratio, 1, 1, max_abs,
        ),
        lab, spmap.center, step, label="dense cost volume", iters=4,
    )
    scan_time(
        lambda l, c, st, k: cost_volume.superpixel_cost_volume_strips(
            l, c, st + k * 1e-6, dl_t, s.array_width, s.bl_ratio, 1, 1,
        ),
        lab, spmap.center, step, label="strips cost volume", iters=4,
    )


if __name__ == "__main__":
    main()
