"""Probe: the TRUE fused cost of scoring all update moves in one sweep.

The round-3 numbers don't add up: propagate_iteration[0] = 1002 ms total,
but its parts (rasterize 190 + cache 115 + 24 x smoothness 89 + move
gather 3.5) leave only ~600 ms for 24 consistency scorings whose ISOLATED
cost is 88.5 ms each (2.1 s).  Either the fused gather engine runs ~3.5x
faster under concurrency than isolated, or something else is overlapped.
The strip-scorer design hinges on which is true.

Also probes: one BATCHED gather carrying all 16 moves' rows at once, and
the wide-row staging gather at the real (V*H, 4W) strip layout.

Run: python -u tools/probe_score_batch.py
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


def scan_time(fn, *args, iters=6, label=""):
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
          f"update moves={m}", flush=True)

    cache = refine.build_cache(
        ctx, state.d, state.n, gamma=kw0["gamma"], steps=steps0, step_size=ss0
    )
    jax.block_until_ready(cache)

    # --- the fused scoring of all m update moves (consistency only) -------
    def cons_all(c, ca, st, k):
        d_adopt, n1x, n1y, n1z, _, _ = refine.gather_update_moves(
            c, st._replace(d=st.d + k * 1e-6), offs, kw0["gamma"]
        )
        mv = lambda a: jnp.moveaxis(a, -1, 0)
        d_c = mv(d_adopt)
        n_c = jnp.stack([mv(n1x), mv(n1y), mv(n1z)], axis=-1)
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

    scan_time(cons_all, ctx, cache, state,
              label=f"consistency x{m} moves (fused, chunk=4)", iters=4)

    # --- smoothness for all m moves --------------------------------------
    def smooth_all(c, ca, st, k):
        d_adopt, n1x, n1y, n1z, _, _ = refine.gather_update_moves(
            c, st._replace(d=st.d + k * 1e-6), offs, kw0["gamma"]
        )
        mv = lambda a: jnp.moveaxis(a, -1, 0)
        n_c = jnp.stack([mv(n1x), mv(n1y), mv(n1z)], axis=-1)
        sm = jax.vmap(
            lambda d, n: refine.smoothness_from_cache(ca, d, n, alpha=kw0["alpha"])
        )(mv(d_adopt), n_c)
        return jnp.sum(sm, axis=(1, 2, 3))

    scan_time(smooth_all, ctx, cache, state,
              label=f"smoothness x{m} moves (fused)", iters=4)

    # --- one batched gather with all m moves' rows in one call ------------
    n_rows = 40 * mh * 9 * mw
    tbl = jnp.asarray(np.random.randn(v * h * w, 4), jnp.float32)
    idx_all = jnp.asarray(
        np.random.randint(0, v * h * w, size=(m * n_rows,)), jnp.int32)

    def batched_gather(t, i, k):
        g = t[(i + k.astype(jnp.int32)) % (v * h * w)]
        return jnp.sum(g, axis=0)

    t_bg = scan_time(batched_gather, tbl, idx_all,
                     label=f"ONE gather of {m}x11.66M narrow rows", iters=2)
    print(f"  -> {m * n_rows / t_bg / 1e6:.0f} M rows/s", flush=True)

    # --- wide-row staging gather at the strip layout ----------------------
    # (V*H, 4W) table; rows = 11.66M (pair,cell,sample); 104 f32 per row
    tbl2 = jnp.asarray(np.random.randn(v * h, 4 * w), jnp.float32)
    starts = np.stack([
        np.random.randint(0, v * h, size=(n_rows,)),
        4 * np.random.randint(0, w - 26, size=(n_rows,)),
    ], axis=-1).astype(np.int32)
    starts_j = jnp.asarray(starts)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1),
    )

    def strip_gather(t, st_, k):
        st_ = st_.at[:, 0].set((st_[:, 0] + k.astype(jnp.int32)) % (v * h))
        g = jax.lax.gather(t, st_, dn, slice_sizes=(1, 104),
                           mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(g, axis=0)

    t_sg = scan_time(strip_gather, tbl2, starts_j,
                     label="strip staging gather 11.66M x 104 f32", iters=4)
    print(f"  -> {n_rows / t_sg / 1e6:.0f} M rows/s", flush=True)

    # half the rows (per-(pair,cell,3-sample-row) sharing would give 3x less)
    def strip_gather_half(t, st_, k):
        st_ = st_[: n_rows // 3]
        st_ = st_.at[:, 0].set((st_[:, 0] + k.astype(jnp.int32)) % (v * h))
        g = jax.lax.gather(t, st_, dn, slice_sizes=(1, 104),
                           mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(g, axis=0)

    t_sg3 = scan_time(strip_gather_half, tbl2, starts_j,
                      label="strip staging gather 3.89M x 104 f32", iters=4)
    print(f"  -> {n_rows / 3 / t_sg3 / 1e6:.0f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
