"""Time the strip-kernel consistency engine vs the per-move gather engine
at the reference config, scan-chained (memoization-proof).

Run: python -u tools/probe_cons_strips.py [pallas|xla]
(the argument picks the strips engine's lane-resolve backend; "xla" is the
round-5 fallback for the Mosaic grid-count fault)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import (
    DerivedGeometry, RefinementSchedule, SlicParams, SystemSettings,
    build_disp_levels, build_view_subsets,
)
from cl_multiview_stereo_tpu.io.images import load_image_array
from cl_multiview_stereo_tpu.ops import cost_volume, refine, slic, superpixel
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab
from cl_multiview_stereo_tpu.ops.pallas.consistency import consistency_moves


def scan_time(fn, *args, iters=4, label=""):
    @jax.jit
    def run(seed, *a):
        def body(carry, k):
            out = fn(*a, carry * 0 + seed + k)
            leaves = jax.tree_util.tree_leaves(out)
            return carry + jnp.mean(leaves[0]).astype(jnp.float32), None

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
    print(f"{label:52s} {t*1e3:9.1f} ms", flush=True)
    return t


def main():
    lane_backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    eng_name = "strips" if lane_backend == "pallas" else "strips_xla"
    s = SystemSettings()
    rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
    h, w = rgb.shape[1:3]
    geom = DerivedGeometry.create(w, h, s)
    sched = RefinementSchedule.create(s)
    disp_levels = build_disp_levels(s)
    view_subset_np, subset_num_np = build_view_subsets(s)

    lab = rgb_to_lab(jnp.asarray(rgb))
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    disp_init = cost_volume.initial_depth_estimation(
        lab, spmap.center, extent, disp_levels,
        jnp.asarray(view_subset_np), jnp.asarray(subset_num_np),
        s.array_width, s.bl_ratio, method="dense",
    )
    flat = refine.compute_flatness(spmap.color, sched.gamma_eff)
    ctx = refine.make_context(
        spmap.center, spmap.color, disp_init, labels, extent, flat,
        jnp.asarray(view_subset_np), s.array_width,
    )
    pairs = refine.pairs_from_subsets(view_subset_np, s.array_width)
    kw0 = dict(gamma=sched.gamma_eff, alpha=sched.alpha_eff,
               fuse=sched.fuse_eff, bl_ratio=sched.bl_ratio)
    state = refine.init_state(ctx, pairs=pairs, **kw0,
                              steps=sched.kernel_steps,
                              step_size=sched.sp_kernel_step)
    jax.block_until_ready(state)
    v, mh, mw = state.d.shape
    steps0, ss0 = sched.steps_per_iter[0], sched.step_size_per_iter[0]
    offs = refine._update_move_offsets(steps0, ss0, mw, mh)
    m = len(offs)
    print(f"scene: V={v} {h}x{w}, map {mh}x{mw}, pairs={len(pairs)}, "
          f"moves={m}", flush=True)

    cache = refine.build_cache(
        ctx, state.d, state.n, gamma=kw0["gamma"], steps=steps0, step_size=ss0
    )
    jax.block_until_ready(cache)

    def cands(st, k):
        d_adopt, n1x, n1y, n1z, _, _ = refine.gather_update_moves(
            ctx, st._replace(d=st.d + k * 1e-6), offs, kw0["gamma"]
        )
        mv = lambda a: jnp.moveaxis(a, -1, 0)
        return mv(d_adopt), jnp.stack([mv(n1x), mv(n1y), mv(n1z)], axis=-1)

    # strips engine: all m moves in one call
    def strips_all(c, ca, st, k):
        d_c, n_c = cands(st, k)
        cs, _ = consistency_moves(
            c, ca, d_c, n_c, st.d, st.n, pairs=pairs,
            lane_backend=lane_backend, **kw0
        )
        return jnp.sum(cs, axis=(1, 2, 3))

    scan_time(strips_all, ctx, cache, state,
              label=f"consistency x{m} moves STRIPS({lane_backend}) engine",
              iters=4)

    # gather engine (old): chunked vmap
    def gather_all(c, ca, st, k):
        d_c, n_c = cands(st, k)
        chunk = refine._SCORE_CHUNK
        dcs = d_c.reshape((-1, chunk) + d_c.shape[1:])
        ncs = n_c.reshape((-1, chunk) + n_c.shape[1:])

        def body(_, xs):
            dci, nci = xs
            cs1 = jax.vmap(
                lambda d, n: refine.consistency_from_cache(
                    c, ca, d, n, pairs=pairs, **kw0)
            )(dci, nci)
            return 0, jnp.sum(cs1, axis=(1, 2, 3))

        _, acc = jax.lax.scan(body, 0, (dcs, ncs))
        return acc

    scan_time(gather_all, ctx, cache, state,
              label=f"consistency x{m} moves GATHER engine", iters=4)

    # whole iteration, both engines
    for eng in (eng_name, "gather"):
        scan_time(
            lambda c, st, k, e=eng: refine._propagate_iteration(
                c, st._replace(d=st.d + k * 1e-6), 0, pairs=pairs,
                steps=steps0, step_size=ss0, cons_engine=e, **kw0,
            ).d,
            ctx, state, label=f"propagate_iteration[0] {eng}", iters=4,
        )


if __name__ == "__main__":
    main()
