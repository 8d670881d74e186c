"""Roofline measurement for the Pallas plane-sweep kernel (BASELINE.md:
cost-volume kernel at >90% of the per-chip roofline).

The kernel is bandwidth-roofline by design (ops/pallas/sweep.py): per row
tile it streams the reference rows once and one neighbor slab per pair;
the D-hypothesis sweep then runs out of VMEM.  The model traffic is

    bytes = tiles * [ref_patch + pairs * slab + 2 * outputs]

and the roofline ratio is (bytes / time) / HBM_peak.  Run on the real chip:

    python tools/roofline.py [--height 1080 --width 1920 --views 2 --d 64]
"""

import argparse
import json
import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_PEAK_GBPS = {  # per-chip peak HBM bandwidth
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--tile-h", type=int, default=16)
    ap.add_argument("--chip", default="v5e")
    args = ap.parse_args()

    import jax.numpy as jnp

    from cl_multiview_stereo_tpu.ops.pallas.sweep import pad_images, plane_sweep_pallas

    v, h, w, d_num = args.views, args.height, args.width, args.d
    ladder = tuple(float(x) for x in range(4, 4 + d_num))
    # simple horizontal stereo pairs: every view vs its right neighbor
    pairs = tuple(
        p for z in range(v) for p in
        ((z, z + 1, 1, 0), (z + 1, z, -1, 0))[: (2 if z + 1 < v else 0)]
    )
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.random((v, h, w, 3), dtype=np.float32) * 100)

    # Memoization-proof timing (CLAUDE.md): chain K executions inside one
    # lax.scan with a per-step input perturbation and pull a scalar — the
    # axon tunnel memoizes identical whole executions content-addressed,
    # so the earlier repeat-loop form measured dispatch, not compute.
    import time as _time

    import jax

    k_iters = 3

    @jax.jit
    def run(seed, lab):
        def body(carry, k):
            disp, cost = plane_sweep_pallas(
                lab + (carry + k) * 1e-7, ladder, pairs, 1.0, args.tile_h
            )
            return carry + jnp.mean(disp) + jnp.mean(cost), None

        c, _ = jax.lax.scan(body, seed, jnp.arange(k_iters, dtype=jnp.float32))
        return c

    float(run(jnp.float32(0.0), lab))  # compile+warm
    ts = []
    for s_ in (1.0, 2.0):
        t0 = _time.perf_counter()
        float(run(jnp.float32(s_), lab))
        ts.append(_time.perf_counter() - t0)
    t = min(ts) / k_iters

    # traffic model (mirrors the kernel's DMAs; see pad_images for geometry)
    max_sx = max(abs(int(math.ceil(dd * p[2]))) for dd in ladder for p in pairs)
    max_sy = max(abs(int(math.ceil(dd * p[3]))) for dd in ladder for p in pairs)
    _, g = pad_images(lab, max_sx, max_sy, args.tile_h)
    per_ref_pairs = max(sum(1 for p in pairs if p[0] == z) for z in range(v))
    ref_bytes = 3 * (args.tile_h + 8) * g["wp"] * 4
    slab_bytes = 3 * g["slab_h"] * g["wp"] * 4
    out_bytes = 2 * args.tile_h * w * 4
    tiles = v * g["n_tiles"]
    total = tiles * (ref_bytes + per_ref_pairs * slab_bytes + out_bytes)

    achieved = total / t / 1e9
    peak = HBM_PEAK_GBPS.get(args.chip, 819.0)
    print(json.dumps({
        "metric": "sweep_kernel_roofline",
        "config": f"{v}x{h}x{w} D={d_num}",
        "time_ms": round(t * 1e3, 2),
        "model_bytes_gb": round(total / 1e9, 3),
        "achieved_gbps": round(achieved, 1),
        "peak_gbps": peak,
        "roofline_frac": round(achieved / peak, 3),
        "mp_per_s": round(v * h * w / t / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
