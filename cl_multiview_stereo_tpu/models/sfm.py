"""Structure-from-motion: projective cameras, triangulation, and bundle
adjustment with a distributed Schur-complement solver (north-star extension).

The reference has no poses and no solver anywhere in its tree (SURVEY.md
section 2.3); its implicit rectified-grid camera (disparity shift scaled by
``bl_ratio``, clcode.cl:1033-1034) becomes one special case of the pinhole
model here (``grid_rig_poses``).

Design (TPU-first):
  * every quantity is a dense, shape-static array: C cameras (axis-angle +
    translation), P points, N observations (camera id, point id, uv, weight);
  * Gauss-Newton with Levenberg damping; per-observation Jacobians come from
    ``jax.jacfwd`` of the projection (2x6 camera, 2x3 point blocks);
  * the reduced camera system is assembled by segment-sums over observations
    and solved densely (6C x 6C) — cameras are few, points are many, which
    is exactly what the Schur trick exploits;
  * the distributed form shards the observation axis over the mesh and
    reduces every per-point and per-camera accumulation with ``psum``
    (``shard_map``), so each chip touches only its observations — the
    camera solve is replicated (tiny).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Camera model
# ---------------------------------------------------------------------------


def rodrigues(aa: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = aa / jnp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    k = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )
    t = theta[..., None]
    eye = jnp.eye(3, dtype=aa.dtype)
    r = eye + jnp.sin(t) * k + (1.0 - jnp.cos(t)) * (k @ k)
    return jnp.where(small[..., None], eye + k, r)


def project(aa: jax.Array, t: jax.Array, X: jax.Array, intr: jax.Array) -> jax.Array:
    """Pinhole projection of point X (3,) by camera (aa, t), intrinsics
    (fx, fy, cx, cy).  Returns (2,) pixel coords."""
    Xc = rodrigues(aa) @ X + t
    z = Xc[2]
    u = intr[0] * Xc[0] / z + intr[2]
    v = intr[1] * Xc[1] / z + intr[3]
    return jnp.stack([u, v])


def grid_rig_poses(
    view_num: int, array_width: int, baseline: float, bl_ratio: float
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's implicit camera rig as explicit poses: identity
    rotations, translations on a regular grid with the vertical pitch scaled
    by ``bl_ratio`` (clcode.cl:1033-1034)."""
    z = np.arange(view_num)
    t = np.stack(
        [
            -(z % array_width) * baseline,
            -(z // array_width) * baseline * bl_ratio,
            np.zeros(view_num),
        ],
        axis=-1,
    ).astype(np.float32)
    return np.zeros((view_num, 3), np.float32), t


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------


def triangulate(
    aa: jax.Array,  # (C, 3)
    t: jax.Array,  # (C, 3)
    intr: jax.Array,  # (4,)
    cam_ab: jax.Array,  # (M, 2) int32 camera pair per match
    uv_a: jax.Array,  # (M, 2)
    uv_b: jax.Array,  # (M, 2)
) -> jax.Array:
    """Midpoint triangulation of matched rays.  Returns (M, 3) points."""
    R = rodrigues(aa)  # (C, 3, 3)
    centers = -jnp.einsum("cij,ci->cj", R, t)  # camera centers (C, 3)

    def ray(cam, uv):
        d = jnp.stack(
            [(uv[0] - intr[2]) / intr[0], (uv[1] - intr[3]) / intr[1], jnp.ones(())]
        )
        dw = R[cam].T @ d
        return centers[cam], dw / jnp.linalg.norm(dw)

    def one(pair, ua, ub):
        oa, da = ray(pair[0], ua)
        ob, db = ray(pair[1], ub)
        # closest points on the two rays
        w0 = oa - ob
        a = jnp.dot(da, da)
        b = jnp.dot(da, db)
        c = jnp.dot(db, db)
        d_ = jnp.dot(da, w0)
        e = jnp.dot(db, w0)
        denom = a * c - b * b
        s = jnp.where(jnp.abs(denom) > 1e-9, (b * e - c * d_) / denom, 0.0)
        r = jnp.where(jnp.abs(denom) > 1e-9, (a * e - b * d_) / denom, 0.0)
        return 0.5 * ((oa + s * da) + (ob + r * db))

    return jax.vmap(one)(cam_ab, uv_a, uv_b)


# ---------------------------------------------------------------------------
# Bundle adjustment
# ---------------------------------------------------------------------------


class BAProblem(NamedTuple):
    aa: jax.Array  # (C, 3) axis-angle
    t: jax.Array  # (C, 3)
    X: jax.Array  # (P, 3)
    intr: jax.Array  # (4,)
    obs_cam: jax.Array  # (N,) int32
    obs_pt: jax.Array  # (N,) int32
    obs_uv: jax.Array  # (N, 2)
    obs_w: jax.Array  # (N,) float32 weights (0 disables an observation)


def residuals(p: BAProblem) -> jax.Array:
    def one(cam, pt, uv):
        return project(p.aa[cam], p.t[cam], p.X[pt], p.intr) - uv

    return jax.vmap(one)(p.obs_cam, p.obs_pt, p.obs_uv)  # (N, 2)


def rms_error(p: BAProblem) -> jax.Array:
    r = residuals(p) * p.obs_w[:, None]
    denom = jnp.maximum(jnp.sum(p.obs_w), 1.0)
    return jnp.sqrt(jnp.sum(r * r) / (2.0 * denom))


def _obs_blocks(p: BAProblem):
    """Per-observation residual + Jacobian blocks (2x6 camera, 2x3 point)."""

    def res_fn(camp, X, cam_i, uv):
        return project(camp[:3], camp[3:], X, p.intr) - uv

    def one(cam, pt, uv, wgt):
        camp = jnp.concatenate([p.aa[cam], p.t[cam]])
        X = p.X[pt]
        r = res_fn(camp, X, cam, uv)
        jc = jax.jacfwd(res_fn, argnums=0)(camp, X, cam, uv)  # (2, 6)
        jp = jax.jacfwd(res_fn, argnums=1)(camp, X, cam, uv)  # (2, 3)
        return r * wgt, jc * wgt, jp * wgt

    return jax.vmap(one)(p.obs_cam, p.obs_pt, p.obs_uv, p.obs_w)


def _assemble(p: BAProblem, r, jc, jp, n_cam: int, n_pt: int, psum=None):
    """Normal-equation blocks via segment sums; ``psum`` reduces partials
    across shards when given."""
    hcc = jax.ops.segment_sum(
        jnp.einsum("nij,nik->njk", jc, jc), p.obs_cam, num_segments=n_cam
    )  # (C, 6, 6)
    hpp = jax.ops.segment_sum(
        jnp.einsum("nij,nik->njk", jp, jp), p.obs_pt, num_segments=n_pt
    )  # (P, 3, 3)
    bc = jax.ops.segment_sum(
        -jnp.einsum("nij,ni->nj", jc, r), p.obs_cam, num_segments=n_cam
    )  # (C, 6)
    bp = jax.ops.segment_sum(
        -jnp.einsum("nij,ni->nj", jp, r), p.obs_pt, num_segments=n_pt
    )  # (P, 3)
    if psum is not None:
        hcc, hpp, bc, bp = psum(hcc), psum(hpp), psum(bc), psum(bp)
    return hcc, hpp, bc, bp


def _point_slots(obs_pt: jax.Array, max_deg: int):
    """Sort observations by point and rank each within its point group.

    Returns ``(order, slot)`` with ``slot[i] < max_deg`` for every
    observation of a point with degree <= ``max_deg``.  Observations past
    ``max_deg`` (caller sized it wrong) are clamped to the last slot —
    their couplings then merge, so callers must pass the true max degree
    (``run_sfm`` computes it from the match table).
    """
    order = jnp.argsort(obs_pt)
    pt_s = obs_pt[order]
    first = jnp.searchsorted(pt_s, pt_s, side="left")
    slot = jnp.minimum(
        jnp.arange(pt_s.shape[0], dtype=jnp.int32) - first.astype(jnp.int32),
        max_deg - 1,
    )
    return order, pt_s, slot


def _schur_corr_blocked(
    pt_s, cam_s, y_s, w_s, n_cam: int, n_pt: int, slot, max_deg: int,
    psum=None, chunk: int = 2048,
):
    """The camera-coupling correction ``S -= sum_j Y_j Hpp_j^-1 W_j^T`` in a
    BLOCKED form: per-point compact slot tables (P, D, 6, 3) with D = max
    observations per point, then a point-chunked scan accumulating (6, 6)
    blocks into the (C, C) camera-pair grid.  Replaces the (P, 6C, 3)
    scatter-add that capped the solver at C <= ~128 (VERDICT r3 item 8):
    memory is now O(P*D) + O(chunk*D^2) regardless of camera count, so the
    100+ camera multi-scene configuration fits.

    Sharded use: the caller scatters LOCAL observations with GLOBAL slot
    ids and psums the slot tables — each (point, slot) cell is written by
    exactly one shard, so the psum reconstructs the global tables exactly.
    """
    y_d = jnp.zeros((n_pt, max_deg, 6, 3), y_s.dtype).at[pt_s, slot].add(y_s)
    w_d = jnp.zeros((n_pt, max_deg, 6, 3), w_s.dtype).at[pt_s, slot].add(w_s)
    # camera id per slot (-1 = empty); +1 trick keeps 0 a valid camera
    cam_d = (
        jnp.zeros((n_pt, max_deg), jnp.int32).at[pt_s, slot].add(cam_s + 1) - 1
    )
    if psum is not None:
        y_d, w_d = psum(y_d), psum(w_d)
        cam_d = psum(cam_d + 1) - 1  # empty cells stay -1 across shards
    n_chunk = -(-n_pt // chunk)
    pad = n_chunk * chunk - n_pt
    if pad:
        y_d = jnp.pad(y_d, ((0, pad), (0, 0), (0, 0), (0, 0)))
        w_d = jnp.pad(w_d, ((0, pad), (0, 0), (0, 0), (0, 0)))
        cam_d = jnp.pad(cam_d, ((0, pad), (0, 0)), constant_values=-1)

    def body(s_acc, q0):
        y_c = jax.lax.dynamic_slice_in_dim(y_d, q0, chunk, axis=0)
        w_c = jax.lax.dynamic_slice_in_dim(w_d, q0, chunk, axis=0)
        cam_c = jax.lax.dynamic_slice_in_dim(cam_d, q0, chunk, axis=0)
        contrib = jnp.einsum("qaij,qbkj->qabik", y_c, w_c)  # (Q, D, D, 6, 6)
        ok = (cam_c[:, :, None] >= 0) & (cam_c[:, None, :] >= 0)
        blk = jnp.clip(cam_c[:, :, None], 0, n_cam - 1) * n_cam + jnp.clip(
            cam_c[:, None, :], 0, n_cam - 1
        )
        s_acc = s_acc + jax.ops.segment_sum(
            jnp.where(ok[..., None, None], contrib, 0.0).reshape(-1, 6, 6),
            blk.reshape(-1),
            num_segments=n_cam * n_cam,
        )
        return s_acc, None

    s0 = jnp.zeros((n_cam * n_cam, 6, 6), y_s.dtype)
    s_blocks, _ = jax.lax.scan(
        body, s0, jnp.arange(n_chunk, dtype=jnp.int32) * chunk
    )
    # (C*C, 6, 6) -> (6C, 6C)
    return (
        s_blocks.reshape(n_cam, n_cam, 6, 6)
        .transpose(0, 2, 1, 3)
        .reshape(n_cam * 6, n_cam * 6)
    )


def _schur_solve(
    p: BAProblem, r, jc, jp, n_cam, n_pt, damping, psum=None,
    fix_rotations: bool = False, max_deg: int = 16, slot_info=None,
):
    hcc, hpp, bc, bp = _assemble(p, r, jc, jp, n_cam, n_pt, psum)

    lam = damping
    hpp = hpp + lam * jnp.eye(3)[None] * jnp.maximum(
        jnp.trace(hpp, axis1=-2, axis2=-1)[..., None, None] / 3.0, 1e-6
    )
    hpp_inv = jnp.linalg.inv(hpp)  # (P, 3, 3)

    # W blocks per observation: jc^T jp (6, 3); Schur outer products couple
    # camera pairs through shared points.  Assemble the dense reduced system
    # S (6C x 6C) via scatter-add over observation pairs sharing a point:
    # S -= sum_j (sum_i W_ij) ... done as per-point (6C-sparse) outer terms.
    w_obs = jnp.einsum("nij,nik->njk", jc, jp)  # (N, 6, 3)
    # Per-point stacked camera coupling: for each point j, Y_j = sum over its
    # obs of W placed at the obs camera row.  We avoid a (P, C, 6, 3) dense
    # tensor by accumulating the two Schur contractions directly:
    #   S[a,b] -= W_aj Hpp_j^-1 W_bj^T  for every obs pair (a, j), (b, j)
    # = scatter over the N x N obs pairs with equal point id — done as a
    # segment matmul through the point axis.
    y_obs = jnp.einsum("njk,nkl->njl", w_obs, hpp_inv[p.obs_pt])  # (N, 6, 3)
    # rhs correction: bc - sum_j W_j Hpp_j^-1 bp_j  (the correction is a
    # local partial sum; reduce it before subtracting from the already
    # reduced bc)
    rhs_corr = jax.ops.segment_sum(
        jnp.einsum("njk,nk->nj", y_obs, bp[p.obs_pt]), p.obs_cam, num_segments=n_cam
    ).reshape(-1)
    if psum is not None:
        rhs_corr = psum(rhs_corr)
    rhs = bc.reshape(-1) - rhs_corr

    # Blocked Schur coupling: per-point slot tables instead of a (P, 6C, 3)
    # scatter (see _schur_corr_blocked).  Single-device: sort obs by point
    # here; sharded: the caller pre-sorted globally and passes global slots.
    if slot_info is None:
        order, pt_s, slot = _point_slots(p.obs_pt, max_deg)
        s_corr = _schur_corr_blocked(
            pt_s, p.obs_cam[order], y_obs[order], w_obs[order],
            n_cam, n_pt, slot, max_deg,
        )
    else:
        slot = slot_info
        s_corr = _schur_corr_blocked(
            p.obs_pt, p.obs_cam, y_obs, w_obs,
            n_cam, n_pt, slot, max_deg, psum=psum,
        )

    hcc_d = hcc + lam * jnp.eye(6)[None] * jnp.maximum(
        jnp.trace(hcc, axis1=-2, axis2=-1)[..., None, None] / 6.0, 1e-6
    )
    s_full = jax.scipy.linalg.block_diag(*[hcc_d[i] for i in range(n_cam)]) - s_corr

    # Gauge fix: pin camera 0 by pinning its 6 rows/cols to identity.
    # ``fix_rotations`` additionally pins every camera's rotation block —
    # the right gauge for the reference's translation-only grid rig, where
    # the narrow FOV makes small rotations nearly indistinguishable from
    # translations (the classic BA ambiguity).
    if fix_rotations:
        fix = jnp.asarray(
            sorted(
                set(range(6))
                | {c * 6 + k for c in range(n_cam) for k in range(3)}
            ),
            jnp.int32,
        )
    else:
        fix = jnp.arange(6)
    s_full = s_full.at[fix, :].set(0.0).at[:, fix].set(0.0)
    s_full = s_full.at[fix, fix].set(1.0)
    rhs = rhs.at[fix].set(0.0)

    dc = jnp.linalg.solve(s_full, rhs).reshape(n_cam, 6)

    # Back-substitute points: dX = Hpp^-1 (bp - W^T dc)
    wt_dc = jax.ops.segment_sum(
        jnp.einsum("njk,nj->nk", w_obs, dc[p.obs_cam]), p.obs_pt, num_segments=n_pt
    )
    if psum is not None:
        wt_dc = psum(wt_dc)
    dx = jnp.einsum("pij,pj->pi", hpp_inv, bp - wt_dc)
    return dc, dx


def _check_max_deg(obs_pt, max_deg: int) -> None:
    """Host-side guard (advisor r4): ``max_deg`` silently MERGES Schur
    couplings for points observed more than ``max_deg`` times, degrading the
    solution with no error.  When ``obs_pt`` is concrete, verify the true
    degree bound; under a trace the caller owns the bound (run_sfm computes
    it exactly)."""
    if isinstance(obs_pt, jax.core.Tracer):
        return
    counts = np.bincount(np.asarray(obs_pt))
    true_deg = int(counts.max()) if counts.size else 0
    if true_deg > max_deg:
        raise ValueError(
            f"max_deg={max_deg} but a point has {true_deg} observations — "
            f"Schur couplings would be silently merged; pass "
            f"max_deg={true_deg} (run_sfm derives it from the match table)"
        )


@partial(jax.jit, static_argnames=("iters", "fix_rotations", "max_deg"))
def _bundle_adjust_jit(
    p: BAProblem, iters: int = 10, damping: float = 1e-3,
    fix_rotations: bool = False, max_deg: int = 16,
) -> BAProblem:
    """Levenberg-damped Gauss-Newton BA (single device).

    ``max_deg``: static bound on observations per point (the slot width of
    the blocked Schur assembly) — pass the true maximum track length;
    points beyond it get their extra couplings merged (run_sfm computes it
    exactly from the match table).
    """
    n_cam = p.aa.shape[0]
    n_pt = p.X.shape[0]

    def step(prob, _):
        r, jc, jp = _obs_blocks(prob)
        dc, dx = _schur_solve(
            prob, r, jc, jp, n_cam, n_pt, damping,
            fix_rotations=fix_rotations, max_deg=max_deg,
        )
        new = prob._replace(
            aa=prob.aa + dc[:, :3], t=prob.t + dc[:, 3:], X=prob.X + dx
        )
        # accept only if error improves (cheap LM-style guard)
        better = rms_error(new) < rms_error(prob)
        keep = lambda a, b: jnp.where(better, a, b)
        merged = BAProblem(
            aa=keep(new.aa, prob.aa),
            t=keep(new.t, prob.t),
            X=keep(new.X, prob.X),
            intr=prob.intr,
            obs_cam=prob.obs_cam,
            obs_pt=prob.obs_pt,
            obs_uv=prob.obs_uv,
            obs_w=prob.obs_w,
        )
        return merged, rms_error(merged)

    out, errs = jax.lax.scan(step, p, None, length=iters)
    return out


def bundle_adjust(
    p: BAProblem, iters: int = 10, damping: float = 1e-3,
    fix_rotations: bool = False, max_deg: int = 16,
) -> BAProblem:
    """Levenberg-damped Gauss-Newton BA (single device).

    ``max_deg``: static bound on observations per point (the slot width of
    the blocked Schur assembly) — pass the true maximum track length
    (checked host-side when the problem is concrete)."""
    _check_max_deg(p.obs_pt, max_deg)
    return _bundle_adjust_jit(
        p, iters=iters, damping=damping,
        fix_rotations=fix_rotations, max_deg=max_deg,
    )


def bundle_adjust_sharded(
    p: BAProblem, mesh, iters: int = 10, damping: float = 1e-3,
    fix_rotations: bool = False, max_deg: int = 16,
):
    """Distributed BA: observations sharded over the mesh's ``view`` axis,
    every normal-equation accumulation reduced with ``psum`` over ICI;
    camera/point state replicated (BASELINE north star: per-chip camera
    blocks, Schur reduction via collectives).

    Observations are globally sorted by point id up front so every shard
    scatters into the blocked Schur slot tables with GLOBAL slot ranks —
    each (point, slot) cell is written by exactly one shard and the psum
    reconstructs the exact global coupling (see _schur_corr_blocked); the
    psum payload is O(P * max_deg), independent of camera count.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    _check_max_deg(p.obs_pt, max_deg)
    n_cam = p.aa.shape[0]
    n_pt = p.X.shape[0]
    n_dev = mesh.shape["view"]
    n_obs = p.obs_cam.shape[0]
    # global point-sort + slot ranks BEFORE sharding (order is irrelevant
    # to every segment/scatter accumulation; only the slots need it)
    order, pt_sorted, slot = _point_slots(p.obs_pt, max_deg)
    p = p._replace(
        obs_cam=p.obs_cam[order],
        obs_pt=pt_sorted,
        obs_uv=p.obs_uv[order],
        obs_w=p.obs_w[order],
    )
    pad = (-n_obs) % n_dev
    if pad:
        p = p._replace(
            obs_cam=jnp.pad(p.obs_cam, (0, pad)),
            # out-of-bounds point id: every scatter/segment-sum DROPS the
            # padded rows (their obs_w = 0 zeroes the dense sums anyway,
            # but the slot-table cam ids must not collide with real cells)
            obs_pt=jnp.pad(p.obs_pt, (0, pad), constant_values=n_pt),
            obs_uv=jnp.pad(p.obs_uv, ((0, pad), (0, 0))),
            obs_w=jnp.pad(p.obs_w, (0, pad)),
        )
        slot = jnp.pad(slot, (0, pad), constant_values=max_deg - 1)

    psum = partial(jax.lax.psum, axis_name="view")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),  # aa, t, X, intr (replicated)
            P("view"), P("view"), P("view"), P("view"), P("view"),  # obs
        ),
        out_specs=(P(), P()),
    )
    def one_round(aa, t, X, intr, ocam, opt, ouv, ow, oslot):
        prob = BAProblem(aa, t, X, intr, ocam, opt, ouv, ow)
        r, jc, jp = _obs_blocks(prob)
        dc, dx = _schur_solve(
            prob, r, jc, jp, n_cam, n_pt, damping, psum=psum,
            fix_rotations=fix_rotations, max_deg=max_deg, slot_info=oslot,
        )
        return dc, dx

    prob = p
    for _ in range(iters):
        dc, dx = one_round(
            prob.aa, prob.t, prob.X, prob.intr,
            prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_w, slot,
        )
        new = prob._replace(
            aa=prob.aa + dc[:, :3], t=prob.t + dc[:, 3:], X=prob.X + dx
        )
        if float(rms_error(new)) < float(rms_error(prob)):
            prob = new
    return prob


def ate(t_est: jax.Array, t_gt: jax.Array) -> jax.Array:
    """Absolute trajectory error (RMSE of camera translations; gauge is
    already fixed to camera 0)."""
    d = t_est - t_gt
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))

# ---------------------------------------------------------------------------
# Pose-graph backend (north-star: "distributed BA with pose-graph backend")
# ---------------------------------------------------------------------------
#
# The reference has no poses at all (its camera is the implicit rectified
# grid of clcode.cl:1033-1034); BASELINE.json's north star asks for a
# pose-graph backend in front of the Schur BA.  Design (TPU-first): edges
# are dense shape-static arrays; per-edge 6-DoF residuals and their
# Jacobians come from ``jax.jacfwd`` vmapped over the edge axis; the
# (6C x 6C) normal equations are assembled with segment-sums over edge
# blocks and solved densely (cameras are few — same shape philosophy as
# the Schur solver above).  The camera-grid rig's adjacency graph is full
# of 4-cycles, so grid edges alone already give the loop-closure structure
# that makes PGO better-conditioned than chaining odometry.


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3) (inverse of
    ``rodrigues`` away from theta = pi)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = axis * sin(theta)
    sin = jnp.sin(theta)
    f = jnp.where(theta < 1e-6, 1.0, theta / jnp.where(sin == 0, 1.0, sin))
    return w * f[..., None]


class PoseGraph(NamedTuple):
    """Relative-pose factor graph.  Edge e measures the i->j transform
    x_j = R(rel_aa[e]) x_i + rel_t[e] for (i, j) = edges[e]; ``w_rot`` /
    ``w_t`` weight the rotation / translation residual blocks.

    ``info``: optional (E, 6, 6) per-edge information matrices (g2o-style;
    e.g. the reduced camera Hessian of the two-view solve that produced the
    factor).  When given it REPLACES the scalar weights — directions the
    factor never observed (a narrow-FOV pair's forward translation, a
    planar pair's rotation) then carry ~zero information instead of
    polluting the graph with their noise."""

    edges: jax.Array  # (E, 2) int32 camera ids (i, j)
    rel_aa: jax.Array  # (E, 3) measured relative rotation (axis-angle)
    rel_t: jax.Array  # (E, 3) measured relative translation
    w_rot: jax.Array  # (E,)
    w_t: jax.Array  # (E,)
    info: jax.Array | None = None  # (E, 6, 6)


def _edge_info(g: PoseGraph) -> jax.Array:
    """(E, 6, 6) information matrices: explicit ``info`` or the scalar
    weights on the diagonal."""
    if g.info is not None:
        return g.info
    w6 = jnp.concatenate(
        [g.w_rot[:, None].repeat(3, 1), g.w_t[:, None].repeat(3, 1)], axis=1
    )
    return jax.vmap(jnp.diag)(w6)


def relative_from_absolute(
    aa: jax.Array, t: jax.Array, edges: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Absolute world->camera poses -> exact relative i->j factors:
    R_ji = R_j R_i^T, t_ji = t_j - R_ji t_i (factor sources: two-view
    estimates, odometry, or a prior rig)."""
    R = rodrigues(aa)
    Ri = R[edges[:, 0]]
    Rj = R[edges[:, 1]]
    Rji = jnp.einsum("eij,ekj->eik", Rj, Ri)  # R_j R_i^T
    tji = t[edges[:, 1]] - jnp.einsum("eij,ej->ei", Rji, t[edges[:, 0]])
    return so3_log(Rji), tji


def _pose_graph_residual(aa_i, t_i, aa_j, t_j, rel_aa, rel_t):
    """6-vector residual of one edge: [log(Rbar^T R_j R_i^T); (t_j - R_ji
    t_i) - tbar]."""
    Ri = rodrigues(aa_i)
    Rj = rodrigues(aa_j)
    Rji = Rj @ Ri.T
    Rbar = rodrigues(rel_aa)
    r_rot = so3_log(Rbar.T @ Rji)
    r_t = (t_j - Rji @ t_i) - rel_t
    return jnp.concatenate([r_rot, r_t])


def pose_graph_residuals(g: PoseGraph, aa: jax.Array, t: jax.Array) -> jax.Array:
    """(E, 6) information-whitened residuals (L^T r with info = L L^T)."""
    r = jax.vmap(
        lambda e, raa, rt: _pose_graph_residual(
            aa[e[0]], t[e[0]], aa[e[1]], t[e[1]], raa, rt
        )
    )(g.edges, g.rel_aa, g.rel_t)
    W = _edge_info(g)
    L = jnp.linalg.cholesky(W + 1e-12 * jnp.eye(6))
    return jnp.einsum("eji,ej->ei", L, r)


@partial(jax.jit, static_argnames=("iters",))
def pose_graph_optimize(
    g: PoseGraph,
    aa0: jax.Array,  # (C, 3)
    t0: jax.Array,  # (C, 3)
    iters: int = 10,
    damping: float = 1e-4,
) -> tuple[jax.Array, jax.Array]:
    """Gauss-Newton pose-graph optimization (camera 0 pinned as gauge).

    Returns the optimized (aa, t).  Dense (6C x 6C) solve per iteration —
    the right trade at camera-array scale (C <= a few hundred), and the
    solve replicates for free under any mesh while the factor evaluation
    axis (E) is embarrassingly shardable."""
    n_cam = aa0.shape[0]

    def res_fn(cam_vec, e, raa, rt):
        # cam_vec: (12,) = [aa_i, t_i, aa_j, t_j]
        return _pose_graph_residual(
            cam_vec[0:3], cam_vec[3:6], cam_vec[6:9], cam_vec[9:12], raa, rt
        )

    def one_iter(state, _):
        aa, t = state
        packed = jax.vmap(
            lambda e: jnp.concatenate([aa[e[0]], t[e[0]], aa[e[1]], t[e[1]]])
        )(g.edges)
        r = jax.vmap(res_fn)(packed, g.edges, g.rel_aa, g.rel_t)  # (E, 6)
        J = jax.vmap(jax.jacfwd(res_fn))(
            packed, g.edges, g.rel_aa, g.rel_t
        )  # (E, 6, 12)
        W = _edge_info(g)  # (E, 6, 6)
        Jw = jnp.einsum("ers,esi->eri", W, J)  # (E, 6, 12)
        # normal equations: H += J^T W J scattered into the 4 (i/j, i/j)
        # 6x6 blocks; b -= J^T W r into the 2 camera rows
        h_blk = jnp.einsum("eri,erj->eij", Jw, J)  # (E, 12, 12)
        b_blk = -jnp.einsum("eri,er->ei", Jw, r)  # (E, 12)
        ei, ej = g.edges[:, 0], g.edges[:, 1]
        ids = jnp.stack(
            [ei * n_cam + ei, ei * n_cam + ej, ej * n_cam + ei, ej * n_cam + ej],
            axis=1,
        )  # (E, 4)
        quads = jnp.stack(
            [
                h_blk[:, 0:6, 0:6],
                h_blk[:, 0:6, 6:12],
                h_blk[:, 6:12, 0:6],
                h_blk[:, 6:12, 6:12],
            ],
            axis=1,
        )  # (E, 4, 6, 6)
        h_cells = jax.ops.segment_sum(
            quads.reshape(-1, 6, 6), ids.reshape(-1), num_segments=n_cam * n_cam
        )
        H = (
            h_cells.reshape(n_cam, n_cam, 6, 6)
            .transpose(0, 2, 1, 3)
            .reshape(n_cam * 6, n_cam * 6)
        )
        b = jax.ops.segment_sum(
            jnp.concatenate([b_blk[:, 0:6], b_blk[:, 6:12]], axis=0),
            jnp.concatenate([ei, ej], axis=0),
            num_segments=n_cam,
        ).reshape(-1)
        # damping scaled to the problem's curvature (info-weighted graphs
        # can be orders of magnitude off unit scale)
        H = H + (
            damping * jnp.maximum(jnp.trace(H) / (6.0 * n_cam), 1e-12)
        ) * jnp.eye(n_cam * 6)
        # gauge: pin camera 0
        fix = jnp.arange(6)
        H = H.at[fix, :].set(0.0).at[:, fix].set(0.0)
        H = H.at[fix, fix].set(1.0)
        b = b.at[fix].set(0.0)
        delta = jnp.linalg.solve(H, b).reshape(n_cam, 6)
        aa_n, t_n = aa + delta[:, :3], t + delta[:, 3:]

        # accept only improving steps (same cheap LM guard as the BA);
        # quadratic-form cost — no cholesky, so singular info is fine
        def cost(aa_, t_):
            r_ = jax.vmap(
                lambda e, raa, rt: _pose_graph_residual(
                    aa_[e[0]], t_[e[0]], aa_[e[1]], t_[e[1]], raa, rt
                )
            )(g.edges, g.rel_aa, g.rel_t)
            return jnp.einsum("ei,eij,ej->", r_, W, r_)

        better = cost(aa_n, t_n) < cost(aa, t)
        keep = lambda a, b_: jnp.where(better, a, b_)
        return (keep(aa_n, aa), keep(t_n, t)), cost(aa, t)

    (aa, t), _ = jax.lax.scan(one_iter, (aa0, t0), None, length=iters)
    return aa, t


def two_view_relative(
    uv_a: jax.Array,  # (E, M, 2) matched pixels in view i
    uv_b: jax.Array,  # (E, M, 2) matched pixels in view j
    w: jax.Array,  # (E, M) match weights (0 = padding/outlier)
    intr: jax.Array,  # (4,)
    aa_seed: jax.Array,  # (E, 3) relative rotation seed
    t_seed: jax.Array,  # (E, 3) relative translation seed (sets the scale
    #                            gauge: the estimate is renormalized to
    #                            ||t_seed|| — monocular two-view scale is
    #                            unobservable)
    iters: int = 20,
    damping: float = 1e-3,
    fix_rotations: bool = False,
    outlier_px: float = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-edge two-view BA, vmapped over the edge axis: camera i pinned at
    identity, camera j's relative 6-DoF and the pair's M points free —
    Schur-eliminated exactly like the global solver (H_pp is (M, 3, 3)
    block-diagonal, the reduced camera system is just 6x6).  Returns
    ``(rel_aa, rel_t, info)`` — the measured relative factors a pose graph
    consumes plus their (E, 6, 6) information matrices (``PoseGraph.info``).

    ``fix_rotations``: pin the relative rotation at the seed (same gauge
    rationale as the global BA: on a narrow-FOV translation rig a small
    rotation is observationally degenerate with a lateral translation, and
    free-rotation two-view factors come out garbage — reproduced in
    tests/test_pose_graph.py)."""

    def triangulate_pair(aa_r, t_r, ua, ub):
        cam = jnp.stack([jnp.zeros_like(aa_r), aa_r])
        tt = jnp.stack([jnp.zeros_like(t_r), t_r])
        m = ua.shape[0]
        pair_idx = jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (m, 1))
        return triangulate(cam, tt, intr, pair_idx, ua, ub)

    def solve_edge(aa_r, t_r, ua, ub, wm):
        X = triangulate_pair(aa_r, t_r, ua, ub)
        X = jnp.where(
            (jnp.isfinite(X).all(-1) & (X[:, 2] > 1e-3))[:, None], X,
            jnp.asarray([0.0, 0.0, 1.0]),
        )
        t_norm0 = jnp.linalg.norm(t_r)
        # scale-gauge pin INSIDE the solve: monocular two-view leaves
        # ||t|| unobservable (a rank-1 null space that stalls GN); one
        # penalty row kappa*(||t|| - ||t_seed||) on the camera block
        # conditions the reduced 6x6 system
        kappa = jnp.maximum(intr[0], intr[1])

        def res_one(camp, Xp, ua_, ub_):
            ra = project(jnp.zeros(3), jnp.zeros(3), Xp, intr) - ua_
            rb = project(camp[0:3], camp[3:6], Xp, intr) - ub_
            return jnp.concatenate([ra, rb])  # (4,)

        if outlier_px > 0.0:
            # same gate as run_sfm's global stage: a mutual-nearest match
            # that is far off at the SEED geometry is an outlier, and one
            # bad match dominates a 6-DoF least-squares fit (reproduced:
            # ungated edges return wildly wrong translation directions)
            r0 = jax.vmap(
                lambda Xp, u1, u2: res_one(
                    jnp.concatenate([aa_r, t_r]), Xp, u1, u2
                )
            )(X, ua, ub)
            wm = wm * (
                jnp.linalg.norm(r0.reshape(-1, 2, 2), axis=-1).max(-1)
                < outlier_px
            ).astype(jnp.float32)

        def scale_res(camp):
            return kappa * (jnp.linalg.norm(camp[3:6]) - t_norm0)

        def gn_step(state, _):
            # adaptive Levenberg damping (carried in the scan state): the
            # two-view cost surface is a long narrow valley in f32 — a
            # constant lambda stalls on its floor (reproduced in tests)
            camp, X_, lam = state
            r = jax.vmap(lambda Xp, u1, u2: res_one(camp, Xp, u1, u2))(
                X_, ua, ub
            )  # (M, 4)
            jc = jax.vmap(
                lambda Xp, u1, u2: jax.jacfwd(res_one, argnums=0)(camp, Xp, u1, u2)
            )(X_, ua, ub)  # (M, 4, 6)
            jp = jax.vmap(
                lambda Xp, u1, u2: jax.jacfwd(res_one, argnums=1)(camp, Xp, u1, u2)
            )(X_, ua, ub)  # (M, 4, 3)
            wv = wm[:, None]
            jcw = jc * wv[..., None]
            jpw = jp * wv[..., None]
            hcc = jnp.einsum("mri,mrj->ij", jcw, jc)  # (6, 6)
            r_s = scale_res(camp)
            j_s = jax.jacfwd(scale_res)(camp)  # (6,)
            hcc = hcc + jnp.outer(j_s, j_s)
            hpp = jnp.einsum("mri,mrj->mij", jpw, jp)  # (M, 3, 3)
            hcp = jnp.einsum("mri,mrj->mij", jcw, jp)  # (M, 6, 3)
            bc = -jnp.einsum("mri,mr->i", jcw, r) - j_s * r_s
            bp = -jnp.einsum("mri,mr->mi", jpw, r)
            hpp = hpp + lam * jnp.eye(3)[None] * jnp.maximum(
                jnp.trace(hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6
            )
            hpp_inv = jnp.linalg.inv(hpp)
            s = hcc + lam * jnp.eye(6) * jnp.maximum(
                jnp.trace(hcc) / 6.0, 1e-6
            ) - jnp.einsum("mij,mjk,mlk->il", hcp, hpp_inv, hcp)
            rhs = bc - jnp.einsum("mij,mjk,mk->i", hcp, hpp_inv, bp)
            if fix_rotations:
                rot = jnp.arange(3)
                s = s.at[rot, :].set(0.0).at[:, rot].set(0.0)
                s = s.at[rot, rot].set(1.0)
                rhs = rhs.at[rot].set(0.0)
            dc = jnp.linalg.solve(s, rhs)
            # back-substitute points: dX = Hpp^-1 (bp - Hcp^T dc)
            dX = jnp.einsum(
                "mij,mj->mi", hpp_inv, bp - jnp.einsum("mij,i->mj", hcp, dc)
            )
            camp_n = camp + dc
            X_n = X_ + dX
            c_new = jnp.sum(
                (jax.vmap(lambda Xp, u1, u2: res_one(camp_n, Xp, u1, u2))(X_n, ua, ub) * wv) ** 2
            ) + scale_res(camp_n) ** 2
            c_old = jnp.sum((r * wv) ** 2) + r_s ** 2
            better = c_new < c_old
            keep = lambda a, b_: jnp.where(better, a, b_)
            lam_n = jnp.clip(jnp.where(better, lam * 0.4, lam * 4.0), 1e-9, 1e3)
            return (keep(camp_n, camp), keep(X_n, X_), lam_n), c_old

        camp0 = jnp.concatenate([aa_r, t_r])
        (camp, X_fin, _), _ = jax.lax.scan(
            gn_step, (camp0, X, jnp.float32(damping)), None, length=iters
        )

        # factor information = reduced camera Hessian at the solution
        # (reprojection terms only — no damping, no scale pin): directions
        # this pair never observed carry ~zero information into the graph
        jc = jax.vmap(
            lambda Xp, u1, u2: jax.jacfwd(res_one, argnums=0)(camp, Xp, u1, u2)
        )(X_fin, ua, ub)
        jp = jax.vmap(
            lambda Xp, u1, u2: jax.jacfwd(res_one, argnums=1)(camp, Xp, u1, u2)
        )(X_fin, ua, ub)
        wv = wm[:, None, None]
        hcc = jnp.einsum("mri,mrj->ij", jc * wv, jc)
        hpp = jnp.einsum("mri,mrj->mij", jp * wv, jp) + 1e-8 * jnp.eye(3)[None]
        hcp = jnp.einsum("mri,mrj->mij", jc * wv, jp)
        info = hcc - jnp.einsum(
            "mij,mjk,mlk->il", hcp, jnp.linalg.inv(hpp), hcp
        )
        info = 0.5 * (info + info.T)
        # PSD projection: the f32 Schur complement cancels ~f^2-scale
        # terms, and roundoff leaves slightly NEGATIVE eigenvalues — an
        # indefinite "information" matrix gives the pose graph descent
        # directions that COLLAPSE the rig (reproduced in tests)
        evals, evecs = jnp.linalg.eigh(info)
        info = (evecs * jnp.maximum(evals, 0.0)[None, :]) @ evecs.T
        # the monocular scale gauge leaves ~zero information ALONG the
        # translation direction; the factor's norm is pinned to the seed
        # baseline (a real prior), so that prior's curvature — the same
        # kappa^2 row the solve used — must ride along, or a pose graph
        # built from these factors can shrink the whole rig cost-free
        t_hat = camp[3:6] / jnp.maximum(jnp.linalg.norm(camp[3:6]), 1e-9)
        info = info.at[3:6, 3:6].add(kappa * kappa * jnp.outer(t_hat, t_hat))
        if fix_rotations:
            # the pinned rotation is rig-prior knowledge, not a two-view
            # measurement: give it weight comparable to the strongest
            # translation direction
            rot_w = jnp.max(jnp.diagonal(info)[3:6]) + 1.0
            rot = jnp.arange(3)
            info = info.at[rot, :].set(0.0).at[:, rot].set(0.0)
            info = info.at[rot, rot].set(rot_w)

        aa_out, t_out = camp[0:3], camp[3:6]
        # scale gauge: renormalize to the seed baseline length
        norm = jnp.linalg.norm(t_out)
        scale = jnp.where(norm > 1e-9, jnp.linalg.norm(t_r) / norm, 1.0)
        return aa_out, t_out * scale, info

    return jax.vmap(solve_edge)(aa_seed, t_seed, uv_a, uv_b, w)
