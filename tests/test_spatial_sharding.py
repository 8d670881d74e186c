"""Depth-slab (TP) and spatial row-tile (SP) sharding vs unsharded results.

Runs on the conftest-provided virtual 8-device CPU backend.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from cl_multiview_stereo_tpu.config import (
    DerivedGeometry,
    SlicParams,
    SystemSettings,
    build_disp_levels,
    build_view_subsets,
)
from cl_multiview_stereo_tpu.models.plane_sweep import build_pairs, plane_sweep_depth
from cl_multiview_stereo_tpu.ops import cost_volume, slic, superpixel
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab
from cl_multiview_stereo_tpu.parallel import spatial
from cl_multiview_stereo_tpu.testing import synthetic


@pytest.fixture(scope="module")
def scene():
    s = SystemSettings(
        array_width=2, array_height=2, spixl_size=8,
        min_disp=3, max_disp=10, inc=1, bl_ratio=1.0,
    )
    views, _ = synthetic.two_plane_scene(
        64, 64, array_width=2, array_height=2, disp_bg=4.0, disp_fg=9.0,
        bl_ratio=1.0, seed=5,
    )
    lab = rgb_to_lab(views)
    geom = DerivedGeometry.create(64, 64, s)
    return s, geom, lab


def test_disp_slab_sharding_matches_unsharded(scene):
    s, geom, lab = scene
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    step = superpixel.extent_step(extent)
    ladder = build_disp_levels(s)  # 8 levels
    view_subset, subset_num = build_view_subsets(s)

    want = np.asarray(
        cost_volume.initial_depth_estimation(
            lab, spmap.center, extent, ladder,
            np.asarray(view_subset), np.asarray(subset_num),
            s.array_width, s.bl_ratio, method="dense",
        )
    )

    devs = np.asarray(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devs, ("disp",))
    got = np.asarray(
        spatial.disp_sharded_depth_init(
            lab, spmap.center, step, ladder, subset_num, mesh,
            s.array_width, s.bl_ratio,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_disp_slab_sharding_uneven_ladder(scene):
    """Ladder length not divisible by the mesh axis: padded with repeats."""
    s, geom, lab = scene
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    step = superpixel.extent_step(extent)
    ladder = build_disp_levels(s)[:5]  # 5 levels on 4 devices
    view_subset, subset_num = build_view_subsets(s)

    want = np.asarray(
        cost_volume.initial_depth_estimation(
            lab, spmap.center, extent, ladder,
            np.asarray(view_subset), np.asarray(subset_num),
            s.array_width, s.bl_ratio, method="dense",
        )
    )
    devs = np.asarray(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devs, ("disp",))
    got = np.asarray(
        spatial.disp_sharded_depth_init(
            lab, spmap.center, step, ladder, subset_num, mesh,
            s.array_width, s.bl_ratio,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_spatial_tile_sweep_matches_unsharded(scene):
    s, geom, lab = scene
    ladder = tuple(float(d) for d in build_disp_levels(s))
    view_subset, subset_num = build_view_subsets(s)
    pairs = build_pairs(view_subset, subset_num, s.array_width)

    want_d, want_c = plane_sweep_depth(lab, ladder, pairs, s.bl_ratio)

    devs = np.asarray(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devs, ("tile",))
    got_d, got_c = spatial.spatial_plane_sweep(
        lab, ladder, pairs, s.bl_ratio, mesh
    )
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(want_c), rtol=1e-6, atol=1e-5
    )


def test_spatial_tile_sweep_nonunit_bl_ratio(scene):
    """Non-unit bl_ratio exercises fractional vertical shifts in the halo."""
    s, geom, lab = scene
    ladder = tuple(float(d) for d in build_disp_levels(s))
    view_subset, subset_num = build_view_subsets(s)
    pairs = build_pairs(view_subset, subset_num, s.array_width)

    want_d, _ = plane_sweep_depth(lab, ladder, pairs, 1.0359)
    devs = np.asarray(jax.devices("cpu")[:2]).reshape(2)
    mesh = Mesh(devs, ("tile",))
    got_d, _ = spatial.spatial_plane_sweep(lab, ladder, pairs, 1.0359, mesh)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))


def test_spatial_refine_matches_unsharded(scene):
    from cl_multiview_stereo_tpu.config import RefinementSchedule
    from cl_multiview_stereo_tpu.ops import refine

    s, geom, lab = scene
    s = s.replace(kernel_size=16, kernel_step=2, no_prop=2)
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    extent = superpixel.superpixel_extent(labels, spmap.center, geom)
    ladder = build_disp_levels(s)
    view_subset, subset_num = build_view_subsets(s)
    disp_init = cost_volume.initial_depth_estimation(
        lab, spmap.center, extent, ladder,
        np.asarray(view_subset), np.asarray(subset_num),
        s.array_width, s.bl_ratio, method="dense",
    )
    sched = RefinementSchedule.create(s)
    flat = refine.compute_flatness(spmap.color, sched.gamma_eff)
    ctx = refine.make_context(
        spmap.center, spmap.color, disp_init, labels, extent, flat,
        np.asarray(view_subset), s.array_width,
    )
    want = refine.refine(ctx, sched)

    devs = np.asarray(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devs, ("tile",))
    # exact mode (full-image halo)
    got = spatial.spatial_refine(ctx, sched, mesh, halo_disp=None)
    np.testing.assert_array_equal(np.asarray(got.d), np.asarray(want.d))
    np.testing.assert_array_equal(np.asarray(got.sm), np.asarray(want.sm))
    np.testing.assert_array_equal(np.asarray(got.cs), np.asarray(want.cs))
    np.testing.assert_array_equal(np.asarray(got.n), np.asarray(want.n))

    # bounded halo: single-hop ppermute exchange, same result on a scene
    # whose disparities stay far inside the bound
    got2 = spatial.spatial_refine(ctx, sched, mesh, halo_disp=2 * s.max_disp)
    np.testing.assert_array_equal(np.asarray(got2.d), np.asarray(want.d))
    np.testing.assert_array_equal(np.asarray(got2.n), np.asarray(want.n))

    # explicit "auto" bound (1.5 * max|disp0| + spixl_size) also matches on
    # reference-config-like slopes
    got3 = spatial.spatial_refine(ctx, sched, mesh, halo_disp="auto")
    np.testing.assert_array_equal(np.asarray(got3.d), np.asarray(want.d))
    np.testing.assert_array_equal(np.asarray(got3.n), np.asarray(want.n))


def test_halo_exchange_roundtrip():
    """halo_exchange_rows reproduces the global neighborhood of each block."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    devs = np.asarray(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devs, ("tile",))
    x = np.arange(32 * 3, dtype=np.float32).reshape(32, 3)

    fn = shard_map(
        lambda b: spatial.halo_exchange_rows(b, 2, "tile"),
        mesh=mesh,
        in_specs=(P("tile", None),),
        out_specs=P("tile", None),
    )
    out = np.asarray(fn(x)).reshape(4, 12, 3)
    for t in range(4):
        lo, hi = t * 8 - 2, t * 8 + 10
        want = np.zeros((12, 3), np.float32)
        src_lo, src_hi = max(lo, 0), min(hi, 32)
        want[src_lo - lo : src_lo - lo + (src_hi - src_lo)] = x[src_lo:src_hi]
        np.testing.assert_array_equal(out[t], want)
