"""Per-stage wall-time profile of the flagship pipeline on the real chip.

TIMING CAVEAT (round 3): repeat-loop timings through the axon tunnel can
be memoized away (see CLAUDE.md); numbers here are upper-bound sanity
checks only.  For trustworthy component timings use the scan-chained
harness in tools/profile_propagate.py.
"""
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
from cl_multiview_stereo_tpu.ops import cost_volume, fusion, refine, slic, superpixel
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab
from cl_multiview_stereo_tpu.utils.timing import sync, time_fn

s = SystemSettings()
rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
h, w = rgb.shape[1:3]
geom = DerivedGeometry.create(w, h, s)
sched = RefinementSchedule.create(s)
disp_levels = build_disp_levels(s)
view_subset_np, subset_num_np = build_view_subsets(s)
view_subset = jnp.asarray(view_subset_np)
subset_num = jnp.asarray(subset_num_np)

report = {}

def stage(name, fn, *args, **kw):
    t, out = time_fn(fn, *args, warmup=1, iters=2, **kw)
    report[name] = t
    print(f"{name:24s} {t*1e3:9.1f} ms", flush=True)
    return out

lab = stage("rgb_to_lab", rgb_to_lab, jnp.asarray(rgb))
labels, spmap = stage("slic.segment", slic.segment, lab, geom, SlicParams.create(s))
extent = stage("superpixel_extent", superpixel.superpixel_extent, labels, spmap.center, geom)
disp_init = stage(
    "depth_init(dense)", cost_volume.initial_depth_estimation,
    lab, spmap.center, extent, disp_levels, view_subset, subset_num,
    s.array_width, s.bl_ratio, method="dense",
)
flat = stage("flatness", refine.compute_flatness, spmap.color, sched.gamma_eff)
ctx = refine.make_context(
    spmap.center, spmap.color, disp_init, labels, extent, flat,
    view_subset, s.array_width,
)
kw0 = dict(gamma=sched.gamma_eff, alpha=sched.alpha_eff, fuse=sched.fuse_eff,
           bl_ratio=sched.bl_ratio)
state = stage("init_state", refine.init_state, ctx, **kw0,
              steps=sched.kernel_steps, step_size=sched.sp_kernel_step)
for it in range(sched.no_prop):
    state = stage(f"propagate[{it}]", refine.propagate_iteration, ctx, state, it=it,
                  **kw0, steps=sched.steps_per_iter[it],
                  step_size=sched.step_size_per_iter[it])
disp_full = stage("fusion", fusion.fuse_views, labels, spmap.center, state.d,
                  state.n, s.array_width, s.bl_ratio, sched.fuse_eff)
total = sum(report.values())
print(f"{'TOTAL':24s} {total*1e3:9.1f} ms -> {9*h*w/total/1e6:.2f} MP/s")
