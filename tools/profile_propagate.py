"""Trustworthy per-component timing of the propagate path on the chip.

Timing method: every measurement chains K executions inside one jitted
``lax.scan`` with a per-step input perturbation and pulls the scalar result
to the host — the axon tunnel both returns early from block_until_ready and
memoizes identical executions, so naive repeat-loops (profile_gathers.py's
earlier numbers) measure dispatch, not compute.

Run: python -u tools/profile_propagate.py
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


def scan_time(fn, *args, iters=8, label="", perturb_leaf=None):
    """fn(*args, tweak) -> array; tweak varies per step."""

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
    for s in (1.0, 2.0):
        t0 = time.perf_counter()
        float(run(jnp.float32(s), *args))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / iters
    print(f"{label:46s} {t*1e3:9.1f} ms", flush=True)
    return t


def main():
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
    print(f"scene: V={v} {h}x{w}, map {mh}x{mw}, pairs={len(pairs)}", flush=True)
    steps0, ss0 = sched.steps_per_iter[0], sched.step_size_per_iter[0]

    # whole iteration (tweak perturbs state.d -> fresh executions)
    scan_time(
        lambda c, st, k: refine._propagate_iteration(
            c, st._replace(d=st.d + k * 1e-6), 0, pairs=pairs,
            steps=steps0, step_size=ss0, **kw0,
        ).d,
        ctx, state, label="propagate_iteration[0] total",
        iters=4,
    )

    # components
    scan_time(
        lambda c, st, k: refine._rasterize_flat(c, st.d + k * 1e-6, st.n),
        ctx, state, label="rasterize_flat", iters=8,
    )
    scan_time(
        lambda c, st, k: refine.build_cell_cache(
            c, st.d + k * 1e-6, gamma=kw0["gamma"], steps=steps0, step_size=ss0
        ).tap_sim,
        ctx, state, label="build_cell_cache (taps+ring)", iters=8,
    )

    cache = refine.build_cache(
        ctx, state.d, state.n, gamma=kw0["gamma"], steps=steps0, step_size=ss0
    )
    jax.block_until_ready(cache)
    scan_time(
        lambda c, ca, st, k: refine.consistency_from_cache(
            c, ca, st.d + k * 1e-6, st.n, pairs=pairs, **kw0
        ),
        ctx, cache, state, label="consistency_from_cache x1", iters=8,
    )
    scan_time(
        lambda ca, st, k: refine.smoothness_from_cache(
            ca, st.d + k * 1e-6, st.n, alpha=kw0["alpha"]
        ),
        cache, state, label="smoothness_from_cache x1", iters=8,
    )
    offs = refine._update_move_offsets(steps0, ss0, mw, mh)
    scan_time(
        lambda c, st, k: refine.gather_update_moves(
            c, st._replace(d=st.d + k * 1e-6), offs, kw0["gamma"]
        )[0],
        ctx, state, label=f"gather_update_moves ({len(offs)} offs)", iters=8,
    )
    scan_time(
        lambda c, st, k: refine._init_state(
            c._replace(disp0=c.disp0 + k * 1e-6), pairs=pairs,
            steps=sched.kernel_steps, step_size=sched.sp_kernel_step, **kw0
        ).cs,
        ctx, state, label="init_state total", iters=4,
    )


if __name__ == "__main__":
    main()
