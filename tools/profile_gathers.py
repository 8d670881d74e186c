"""Micro-benchmarks of the gather-dominated refinement components on the
real chip: isolates (a) the raw TPU gather rate for this workload's table
shapes / index distributions, (b) the per-component cost of one propagate
iteration (rasterize, cache build, move scoring), so optimization effort
goes where the time actually is (BASELINE.md "Known next-round
optimizations" item 2)."""
import sys, time
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
from cl_multiview_stereo_tpu.utils.timing import time_fn


def bench(name, fn, *args, iters=3, **kw):
    t, out = time_fn(fn, *args, warmup=1, iters=iters, **kw)
    print(f"{name:44s} {t*1e3:9.1f} ms", flush=True)
    return t, out


s = SystemSettings()
rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
h, w = rgb.shape[1:3]
geom = DerivedGeometry.create(w, h, s)
sched = RefinementSchedule.create(s)
disp_levels = build_disp_levels(s)
view_subset_np, subset_num_np = build_view_subsets(s)
view_subset = jnp.asarray(view_subset_np)
subset_num = jnp.asarray(subset_num_np)

lab = rgb_to_lab(jnp.asarray(rgb))
labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
extent = superpixel.superpixel_extent(labels, spmap.center, geom)
disp_init = cost_volume.initial_depth_estimation(
    lab, spmap.center, extent, disp_levels, view_subset, subset_num,
    s.array_width, s.bl_ratio, method="dense",
)
flat = refine.compute_flatness(spmap.color, sched.gamma_eff)
ctx = refine.make_context(
    spmap.center, spmap.color, disp_init, labels, extent, flat,
    view_subset, s.array_width,
)
pairs = refine.pairs_from_subsets(view_subset_np, s.array_width)
kw0 = dict(gamma=sched.gamma_eff, alpha=sched.alpha_eff, fuse=sched.fuse_eff,
           bl_ratio=sched.bl_ratio)
state = refine.init_state(ctx, pairs=pairs, **kw0,
                          steps=sched.kernel_steps,
                          step_size=sched.sp_kernel_step)
jax.block_until_ready(state)
v = state.d.shape[0]
mh, mw = state.d.shape[1:3]
print(f"scene: V={v} {h}x{w}, map {mh}x{mw}, pairs={len(pairs)}", flush=True)

# ---- component costs of one sweep (it=0 geometry: steps/step_size[0]) ----
steps0, ss0 = sched.steps_per_iter[0], sched.step_size_per_iter[0]

rast = jax.jit(lambda c, d, n: refine._rasterize_flat(c, d, n))
bench("rasterize_flat (select form)", rast, ctx, state.d, state.n)

cellcache = jax.jit(
    lambda c, d: refine.build_cell_cache(c, d, gamma=kw0["gamma"],
                                         steps=steps0, step_size=ss0))
_, cache0 = bench("build_cell_cache (taps+ring)", cellcache, ctx, state.d)
cache = cache0._replace(ras=rast(ctx, state.d, state.n))
jax.block_until_ready(cache)

sm1 = jax.jit(lambda ca, d, n: refine.smoothness_from_cache(ca, d, n,
                                                            alpha=kw0["alpha"]))
bench("smoothness_from_cache x1", sm1, cache, state.d, state.n)

cs1 = jax.jit(lambda c, ca, d, n: refine.consistency_from_cache(
    c, ca, d, n, pairs=pairs, **kw0))
bench("consistency_from_cache x1 (11.7M rows)", cs1, ctx, cache,
      state.d, state.n)

offs = refine._update_move_offsets(steps0, ss0, mw, mh)
gum = jax.jit(lambda c, st: refine.gather_update_moves(c, st, offs, kw0["gamma"]))
bench(f"gather_update_moves ({len(offs)} offs)", gum, ctx, state)

prop = jax.jit(lambda c, st: refine._propagate_iteration(
    c, st, 0, pairs=pairs, steps=steps0, step_size=ss0, **kw0))
bench("propagate_iteration[0] total", prop, ctx, state)

ist = jax.jit(lambda c: refine._init_state(
    c, pairs=pairs, steps=sched.kernel_steps,
    step_size=sched.sp_kernel_step, **kw0))
bench("init_state total", ist, ctx)

# ---- raw gather-rate ladder --------------------------------------------
n_tab = v * h * w
key = jax.random.PRNGKey(0)
idx_rand = jax.random.randint(key, (11_700_000,), 0, n_tab, dtype=jnp.int32)
idx_sort = jnp.sort(idx_rand)
# spatially-coherent indices: the real consistency pattern (block-local)
yy = jax.random.randint(key, (11_700_000,), 0, h, dtype=jnp.int32)
xx = jax.random.randint(jax.random.PRNGKey(1), (11_700_000,), 0, w, jnp.int32)
idx_coher = (yy // 8 * 8) * w + xx  # row-coherent


def g4(tab, idx):
    return tab[idx]


for width in (1, 4, 8):
    tab = jnp.zeros((n_tab, width), jnp.float32) if width > 1 else jnp.zeros(
        (n_tab,), jnp.float32)
    f = jax.jit(g4)
    t, _ = bench(f"gather 11.7M rows from (N,{width}) random", f, tab, idx_rand)
    print(f"    -> {11.7e6/t/1e6:8.1f} M rows/s", flush=True)
    t, _ = bench(f"gather 11.7M rows from (N,{width}) sorted", f, tab, idx_sort)
    print(f"    -> {11.7e6/t/1e6:8.1f} M rows/s", flush=True)

# index dtype / 2D-form variations on the (N, 4) table
tab4 = jnp.zeros((n_tab, 4), jnp.float32)
f = jax.jit(g4)
t, _ = bench("gather 11.7M (N,4) coherent-rows", f, tab4, idx_coher)
print(f"    -> {11.7e6/t/1e6:8.1f} M rows/s", flush=True)

# take_along_axis on a (rows, W, 4) layout: per-image-row segment indexing
tab3 = jnp.zeros((v * h, w, 4), jnp.float32)
ridx = jax.random.randint(key, (11_700_000,), 0, v * h, jnp.int32)
cidx = xx


def g3(tb, r, c):
    return tb[r, c]


f3 = jax.jit(g3)
t, _ = bench("gather 11.7M 2D-index (VH, W, 4)", f3, tab3, ridx, cidx)
print(f"    -> {11.7e6/t/1e6:8.1f} M rows/s", flush=True)
