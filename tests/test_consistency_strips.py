"""Differential tests: the strip-staged Pallas consistency engine
(ops.pallas.consistency.consistency_moves) vs the exact per-move XLA gather
form (refine.consistency_from_cache), which is itself mirror-tested.

Covers: h/v strip pairs + diagonal XLA-path pairs merged in subset order,
multi-move batches, and an adversarial case whose candidate planes spread
far beyond the strip window (every such lookup must take the exact escape
fixup path, not an approximation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import (
    DerivedGeometry,
    RefinementSchedule,
    SlicParams,
    SystemSettings,
    build_disp_levels,
    build_view_subsets,
)
from cl_multiview_stereo_tpu.ops import cost_volume, refine, slic, superpixel
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab
from cl_multiview_stereo_tpu.ops.pallas.consistency import consistency_moves
from cl_multiview_stereo_tpu.testing import synthetic


@pytest.fixture(scope="module")
def scene():
    s = SystemSettings(
        array_width=3, array_height=2, spixl_size=8,
        min_disp=4, max_disp=11, inc=1, bl_ratio=1.0359,
        kernel_size=8, kernel_step=2, no_prop=2,
    )
    views, _ = synthetic.two_plane_scene(
        48, 64, array_width=3, array_height=2, disp_bg=5.0, disp_fg=9.0,
        bl_ratio=1.0359, seed=3,
    )
    geom = DerivedGeometry.create(64, 48, s)
    lab = np.asarray(rgb_to_lab(views))
    labels, spmap = slic.segment(lab, geom, SlicParams.create(s))
    ext = np.asarray(superpixel.superpixel_extent(labels, spmap.center, geom))
    disp0 = np.asarray(
        cost_volume.initial_depth_estimation(
            lab, spmap.center, ext, np.asarray(build_disp_levels(s)),
            *[np.asarray(a) for a in build_view_subsets(s)],
            s.array_width, s.bl_ratio,
        )
    )
    sched = RefinementSchedule.create(s)
    subset, _ = build_view_subsets(s)
    fl = np.asarray(refine.compute_flatness(spmap.color, sched.gamma_eff))
    ctx = refine.make_context(
        spmap.center, spmap.color, disp0, labels, ext, fl, subset, s.array_width
    )
    pairs = refine.pairs_from_subsets(subset, s.array_width)
    kw = dict(
        gamma=sched.gamma_eff, alpha=sched.alpha_eff, fuse=sched.fuse_eff,
        bl_ratio=sched.bl_ratio,
    )
    state = refine.init_state(
        ctx, pairs=pairs, **kw,
        steps=sched.kernel_steps, step_size=sched.sp_kernel_step,
    )
    cache = refine.build_cache(
        ctx, state.d, state.n, gamma=kw["gamma"],
        steps=sched.kernel_steps, step_size=sched.sp_kernel_step,
    )
    return dict(ctx=ctx, cache=cache, state=state, pairs=pairs, kw=kw)


def _reference_stack(sc, d_c, n_c):
    outs = [
        refine.consistency_from_cache(
            sc["ctx"], sc["cache"], d_c[m], n_c[m],
            pairs=sc["pairs"], **sc["kw"],
        )
        for m in range(d_c.shape[0])
    ]
    return np.stack([np.asarray(o) for o in outs])


def _check(sc, d_c, n_c, allow_overflow=False):
    got, esc_over = consistency_moves(
        sc["ctx"], sc["cache"], d_c, n_c, sc["state"].d, sc["state"].n,
        pairs=sc["pairs"], **sc["kw"],
    )
    if not allow_overflow:
        assert int(esc_over) == 0, f"escape budget overflow: {int(esc_over)}"
    want = _reference_stack(sc, d_c, n_c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    return got


def test_matches_gather_small_perturbations(scene):
    state = scene["state"]
    m = 5
    rng = np.random.default_rng(0)
    d_c = jnp.asarray(
        np.asarray(state.d)[None]
        + rng.normal(0, 1.5, (m,) + state.d.shape).astype(np.float32)
    )
    n_c = jnp.asarray(
        np.broadcast_to(np.asarray(state.n)[None], (m,) + state.n.shape).copy()
    )
    _check(scene, d_c, n_c)


def test_matches_gather_slanted_planes(scene):
    state = scene["state"]
    m = 4
    rng = np.random.default_rng(1)
    nvec = rng.normal(0, 0.2, (m,) + state.n.shape).astype(np.float32)
    nvec[..., 2] += 1.0
    nvec /= np.linalg.norm(nvec, axis=-1, keepdims=True)
    d_c = jnp.asarray(
        np.asarray(state.d)[None]
        + rng.normal(0, 2.0, (m,) + state.d.shape).astype(np.float32)
    )
    _check(scene, d_c, jnp.asarray(nvec))


def test_matches_gather_escape_spread(scene):
    """Candidates far outside the 32-position window: every lookup routes
    through the block-compacted exact fixup and still matches bitwise-ish."""
    state = scene["state"]
    rng = np.random.default_rng(2)
    shifts = np.asarray([0.0, 40.0, -35.0, 90.0], np.float32)
    d_c = jnp.asarray(
        np.asarray(state.d)[None] + shifts[:, None, None, None]
        + rng.normal(0, 1.0, (4,) + state.d.shape).astype(np.float32)
    )
    n_c = jnp.asarray(
        np.broadcast_to(np.asarray(state.n)[None], (4,) + state.n.shape).copy()
    )
    _check(scene, d_c, n_c)


def test_propagate_strips_matches_gather_engine(scene):
    """Whole-sweep equivalence: the strips engine inside _propagate_iteration
    reproduces the gather engine's accepted state."""
    sc = scene
    sched_steps, sched_ss = 1, 16.0
    kw = dict(**sc["kw"], pairs=sc["pairs"], steps=sched_steps,
              step_size=sched_ss)
    a = refine._propagate_iteration(
        sc["ctx"], sc["state"], 0, cons_engine="strips", **kw
    )
    b = refine._propagate_iteration(
        sc["ctx"], sc["state"], 0, cons_engine="gather", **kw
    )
    for field in ("d", "sm", "cs"):
        ga = np.asarray(getattr(a, field))
        gb = np.asarray(getattr(b, field))
        close = np.isclose(ga, gb, rtol=1e-3, atol=1e-3)
        assert close.mean() >= 0.995, f"{field}: {close.mean()}"


def test_xla_lane_backend_bitwise_equals_pallas(scene):
    """The pure-XLA lane resolve (round-5 fallback for the Mosaic
    grid-count fault) must be BITWISE equal to the Pallas kernel across
    the whole engine, and the whole sweep must match under
    cons_engine="strips_xla"."""
    sc = scene
    state = sc["state"]
    rng = np.random.default_rng(3)
    m = 4
    d_c = jnp.asarray(
        np.asarray(state.d)[None]
        + rng.normal(0, 2.0, (m,) + state.d.shape).astype(np.float32)
    )
    n_c = jnp.asarray(
        np.broadcast_to(np.asarray(state.n)[None], (m,) + state.n.shape).copy()
    )
    a, ea = consistency_moves(
        sc["ctx"], sc["cache"], d_c, n_c, state.d, state.n,
        pairs=sc["pairs"], **sc["kw"],
    )
    b, eb = consistency_moves(
        sc["ctx"], sc["cache"], d_c, n_c, state.d, state.n,
        pairs=sc["pairs"], lane_backend="xla", **sc["kw"],
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ea) == int(eb)

    kw = dict(**sc["kw"], pairs=sc["pairs"], steps=1, step_size=16.0)
    x = refine._propagate_iteration(
        sc["ctx"], sc["state"], 0, cons_engine="strips_xla", **kw
    )
    y = refine._propagate_iteration(
        sc["ctx"], sc["state"], 0, cons_engine="strips", **kw
    )
    for field in ("d", "sm", "cs"):
        np.testing.assert_array_equal(
            np.asarray(getattr(x, field)), np.asarray(getattr(y, field))
        )
