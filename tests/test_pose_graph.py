"""Pose-graph backend (BASELINE north star: "distributed BA with pose-graph
backend").  The reference has no poses (clcode.cl:1033-1034 implicit grid);
these tests cover the pure north-star scope: SO(3) log/exp roundtrip,
relative-factor construction, pose-graph recovery of a perturbed rig (with
the grid's 4-cycle loop closures), two-view factor estimation from image
matches, and the full run_sfm(use_pose_graph=True) chain.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cl_multiview_stereo_tpu.config import SystemSettings
from cl_multiview_stereo_tpu.models import sfm


def _rig_with_rotations(n=3, m=3, bl_ratio=1.0359, rot_scale=0.03, seed=0):
    """Grid rig plus small per-camera rotations (camera 0 stays the gauge)."""
    rng = np.random.default_rng(seed)
    aa, t = sfm.grid_rig_poses(n * m, m, 1.0, bl_ratio)
    aa = aa + rng.normal(0, rot_scale, aa.shape).astype(np.float32)
    aa[0] = 0.0
    return jnp.asarray(aa), jnp.asarray(t)


def _grid_edges(n=3, m=3):
    """4-connected grid adjacency (a < b): rich in 4-cycles = loop closures."""
    out = []
    for r in range(n):
        for c in range(m):
            z = r * m + c
            if c + 1 < m:
                out.append((z, z + 1))
            if r + 1 < n:
                out.append((z, z + m))
    return jnp.asarray(out, jnp.int32)


def test_so3_log_roundtrip():
    rng = np.random.default_rng(1)
    aa = rng.normal(0, 0.8, (32, 3)).astype(np.float32)
    back = np.asarray(sfm.so3_log(sfm.rodrigues(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_relative_from_absolute_consistency():
    """Factors from absolute poses reproduce x_j = R_ji x_i + t_ji."""
    aa, t = _rig_with_rotations()
    edges = _grid_edges()
    rel_aa, rel_t = sfm.relative_from_absolute(aa, t, edges)
    R = sfm.rodrigues(aa)
    X = jnp.asarray(np.random.default_rng(2).normal(0, 2, (5, 3)), jnp.float32)
    for e in range(edges.shape[0]):
        i, j = int(edges[e, 0]), int(edges[e, 1])
        xi = jnp.einsum("ij,pj->pi", R[i], X) + t[i]
        xj = jnp.einsum("ij,pj->pi", R[j], X) + t[j]
        xj_pred = jnp.einsum(
            "ij,pj->pi", sfm.rodrigues(rel_aa[e]), xi
        ) + rel_t[e]
        np.testing.assert_allclose(np.asarray(xj_pred), np.asarray(xj), atol=1e-4)


def test_pose_graph_recovers_perturbed_rig():
    """Exact relative factors + a perturbed seed: the solve must pull every
    camera back onto the true rig (rotations AND translations)."""
    aa_gt, t_gt = _rig_with_rotations()
    edges = _grid_edges()
    rel_aa, rel_t = sfm.relative_from_absolute(aa_gt, t_gt, edges)
    g = sfm.PoseGraph(
        edges=edges, rel_aa=rel_aa, rel_t=rel_t,
        w_rot=jnp.ones(edges.shape[0]), w_t=jnp.ones(edges.shape[0]),
    )
    rng = np.random.default_rng(4)
    mask = np.ones((9, 1), np.float32)
    mask[0] = 0.0  # camera 0 is the gauge
    aa0 = np.asarray(aa_gt) + rng.normal(0, 0.05, (9, 3)).astype(np.float32) * mask
    t0 = np.asarray(t_gt) + rng.normal(0, 0.15, (9, 3)).astype(np.float32) * mask
    seed_ate = float(sfm.ate(jnp.asarray(t0), t_gt))
    aa_out, t_out = sfm.pose_graph_optimize(
        g, jnp.asarray(aa0), jnp.asarray(t0), iters=12
    )
    out_ate = float(sfm.ate(t_out, t_gt))
    assert seed_ate > 0.05, seed_ate  # the perturbation was real
    assert out_ate < 1e-3, (seed_ate, out_ate)
    rot_err = float(jnp.max(jnp.linalg.norm(aa_out - aa_gt, axis=-1)))
    assert rot_err < 1e-3, rot_err
    # residuals at the solution are ~0 (factors were exact)
    r = sfm.pose_graph_residuals(g, aa_out, t_out)
    assert float(jnp.max(jnp.abs(r))) < 1e-3


def test_two_view_relative_recovers_pose():
    """Projected synthetic points + a perturbed relative seed: the vmapped
    two-view BA must recover the true relative pose (up to the seed's
    scale gauge, which here matches the truth)."""
    rng = np.random.default_rng(7)
    intr = jnp.asarray([200.0, 200.0, 80.0, 60.0])
    aa_true = jnp.asarray([[0.02, -0.03, 0.01], [0.0, 0.0, 0.0]], jnp.float32)
    t_true = jnp.asarray([[-1.0, 0.05, 0.02], [-1.0, 0.0, 0.0]], jnp.float32)
    m = 48
    X = jnp.asarray(
        np.stack(
            [rng.uniform(-3, 3, m), rng.uniform(-2, 2, m), rng.uniform(6, 14, m)],
            -1,
        ),
        jnp.float32,
    )
    zero = jnp.zeros(3)
    for e in range(2):
        pass
    proj = lambda aa, t: jnp.stack(
        [sfm.project(aa, t, X[i], intr) for i in range(m)]
    )
    uv_a = jnp.stack([proj(zero, zero), proj(zero, zero)])  # camera i identity
    uv_b = jnp.stack([proj(aa_true[0], t_true[0]), proj(aa_true[1], t_true[1])])
    seed_aa = aa_true + jnp.asarray(
        rng.normal(0, 0.02, (2, 3)).astype(np.float32)
    )
    seed_t = t_true + jnp.asarray(
        rng.normal(0, 0.08, (2, 3)).astype(np.float32)
    )
    # keep the seed's scale equal to the truth so the gauge renorm is exact
    seed_t = seed_t / jnp.linalg.norm(seed_t, axis=-1, keepdims=True) * jnp.linalg.norm(
        t_true, axis=-1, keepdims=True
    )
    rel_aa, rel_t, info = sfm.two_view_relative(
        uv_a, uv_b, jnp.ones((2, m)), intr, seed_aa, seed_t
    )
    # information matrices are symmetric PSD-ish with strong lateral-
    # translation curvature (f^2-scale) on this wide-baseline pair
    assert info.shape == (2, 6, 6)
    np.testing.assert_allclose(
        np.asarray(info), np.asarray(info).transpose(0, 2, 1), rtol=1e-3
    )
    assert float(jnp.min(jnp.diagonal(info, axis1=1, axis2=2))) > -1.0
    np.testing.assert_allclose(np.asarray(rel_aa), np.asarray(aa_true), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rel_t), np.asarray(t_true), atol=2e-2)


def test_run_sfm_with_pose_graph_backend():
    """Full chain on a rendered scene with a noisy seed: the pose-graph
    stage must already repair most of the seed error before the Schur BA
    polishes (same scene/criteria as the plain noisy-seed test)."""
    from cl_multiview_stereo_tpu.models.sfm_pipeline import run_sfm
    from cl_multiview_stereo_tpu.testing.synthetic import two_plane_scene

    s = SystemSettings(
        array_width=2, array_height=2, spixl_size=8, min_disp=4, max_disp=11,
        inc=1, bl_ratio=1.0, kernel_size=8, kernel_step=2, no_prop=1,
    )
    rgb, _ = two_plane_scene(
        120, 160, array_width=2, array_height=2,
        disp_bg=5.0, disp_fg=11.0, bl_ratio=1.0,
    )
    rng = np.random.default_rng(3)
    aa0, t0 = sfm.grid_rig_poses(s.view_num, s.array_width, 1.0, s.bl_ratio)
    mask = np.asarray([0.0] + [1.0] * (t0.shape[0] - 1), np.float32)[:, None]
    noise = rng.normal(0, 0.08, t0.shape).astype(np.float32)
    noise[:, 2] = 0.0
    t_noisy = t0 + noise * mask
    res = run_sfm(
        rgb, s, k=192, max_matches=96, ba_iters=10,
        pose_seed=(aa0, t_noisy), use_pose_graph=True,
    )
    seed_ate_xy = float(np.sqrt(np.mean(np.sum((t_noisy - t0)[:, :2] ** 2, -1))))
    out_ate_xy = float(np.sqrt(np.mean(np.sum((res.t - t0)[:, :2] ** 2, -1))))
    assert out_ate_xy < seed_ate_xy * 0.65, (seed_ate_xy, out_ate_xy)
    assert res.rms_after < res.rms_before * 0.5, (res.rms_before, res.rms_after)
