"""Superpixel plane refinement: flatness, state init, PatchMatch propagation.

Behavioral spec (all ``clMVDE/clcode.cl``):
  * ``compute_flatness``       (cl:1076-1132) — 4-neighbor color variation ->
    ``(exp(-fl*g), 1-exp(-0.25*fl*g))`` weights
  * ``init_smoothness``        (cl:1136-1254) — disparity-agreement score vs
    8 ring neighbors + 4-direction long-range taps at flatness-scaled pitch
  * ``initialize_consistency`` (cl:1260-1357) — cross-view visibility score
    over the 9 extent sample points under fronto-parallel projection
  * ``init_current_state``     (cl:1362-1404) — state = (d, sm, cs, 0,0,1)
  * ``compute_smoothness``     (cl:1407-1525) — like init but extrapolates a
    *candidate plane* (n, d) to each neighbor center
  * ``compute_consistency``    (cl:1528-1631) — plane-interpolates both the
    reference samples and the hit superpixel's stored plane
  * ``update``                 (cl:1635-1673) — PatchMatch propagation move
    with acceptance ``(iter<4 && sm1*similarity>sm0) || cs1*sm1 > sm0*cs0``
  * ``spatialRefinement``      (cl:1687-1723) — plane re-fit through two ring
    neighbors, acceptance ``(iter<4 && sm1>sm0) || sm1*cs1 > sm0*cs0``
  * ``propagate``              (cl:1727-1900) — the per-superpixel move chain
    (8 immediate + 4*steps long-range + 8 refinement moves), Jacobi-swept
    with ping-pong state buffers (depth_refinement.cpp:744-753)

TPU-first design:
  * one jitted program per propagation iteration; the per-superpixel move
    chain becomes a ``lax.scan`` over a static move table, each step
    rescoring *every* superpixel of every view at once (the reference
    parallelizes over superpixels the same way — one thread each);
  * immediate-neighbor taps are static shifts (pad+slice); only the
    flatness-scaled long-range taps and the cross-view consistency lookups
    are data-dependent gathers;
  * the Jacobi ping-pong is ``state_in -> state_out`` functional purity:
    scoring always reads ``state_in``, the chain carry holds each
    superpixel's own evolving plane, exactly like the device registers.

Parameter conventions: ``gamma``/``alpha`` here are the *effective*
multipliers ``1/(2*gamma_cfg^2)`` etc. (RefinementSchedule), ``steps`` and
``step_size`` the per-iteration decayed reach.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_MARGIN = 0.01
_EPS_SM = 0.000001


class RefineState(NamedTuple):
    """The reference's ``float[6]`` per-superpixel state (cl:1398-1403)."""

    d: jax.Array  # (V, Mh, Mw)
    sm: jax.Array  # (V, Mh, Mw)
    cs: jax.Array  # (V, Mh, Mw)
    n: jax.Array  # (V, Mh, Mw, 3)


class RefineContext(NamedTuple):
    """Immutable per-scene arrays shared by every scoring call."""

    center: jax.Array  # (V, Mh, Mw, 2) float32 superpixel centers
    color: jax.Array  # (V, Mh, Mw, 3) float32 superpixel Lab
    disp0: jax.Array  # (V, Mh, Mw) float32 initial disparity (spixl_map.s7)
    labels: jax.Array  # (V, H, W) int32 per-view pixel -> superpixel
    samples: jax.Array  # (V, Mh, Mw, 9, 2) int32 consistency sample offsets
    fl: jax.Array  # (V, Mh, Mw, 2) float32 flatness weights
    view_subset: jax.Array  # (V, max_n) int32, -1 padded
    dv: jax.Array  # (V, max_n, 2) float32 camera-grid deltas (dvx, dvy)
    img_hw: tuple[int, int]


def make_context(
    center, color, disp0, labels, extent, fl, view_subset, array_width: int
) -> RefineContext:
    from cl_multiview_stereo_tpu.ops.superpixel import consistency_samples

    v = center.shape[0]
    z = jnp.arange(v, dtype=jnp.int32)
    ids = jnp.clip(view_subset, 0, v - 1)
    dvx = ((ids % array_width) - (z % array_width)[:, None]).astype(jnp.float32)
    dvy = ((ids // array_width) - (z // array_width)[:, None]).astype(jnp.float32)
    return RefineContext(
        center=jnp.asarray(center),
        color=jnp.asarray(color),
        disp0=jnp.asarray(disp0),
        labels=jnp.asarray(labels),
        samples=consistency_samples(jnp.asarray(extent)),
        fl=jnp.asarray(fl),
        view_subset=view_subset,
        dv=jnp.stack([dvx, dvy], axis=-1),
        img_hw=(labels.shape[1], labels.shape[2]),
    )


# ---------------------------------------------------------------------------
# Flatness (cl:1076-1132)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("gamma",))
def compute_flatness(color: jax.Array, gamma: float) -> jax.Array:
    """``color``: (V, Mh, Mw, 3).  Returns (V, Mh, Mw, 2) = (fl, i_fl)."""
    fl = jnp.ones(color.shape[:3], jnp.float32)
    v, mh, mw = color.shape[:3]
    for dx, dy in ((-1, 0), (1, 0), (0, 1), (0, -1)):
        shifted = jnp.roll(color, shift=(-dy, -dx), axis=(1, 2))
        diff = jnp.sum((shifted - color) ** 2, axis=-1)
        col = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)[None]
        row = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)[None]
        ok = (col + dx >= 0) & (col + dx < mw) & (row + dy >= 0) & (row + dy < mh)
        fl = fl + jnp.where(ok, diff, 0.0)
    return jnp.stack(
        [jnp.exp(-fl * gamma), 1.0 - jnp.exp(-0.25 * fl * gamma)], axis=-1
    )


# ---------------------------------------------------------------------------
# Shared gather helpers
# ---------------------------------------------------------------------------


def _shift_map(x: jax.Array, dx: int, dy: int):
    """Static superpixel-grid shift: out[v, y, x] = in[v, y+dy, x+dx] with a
    validity mask (no wraparound)."""
    v, mh, mw = x.shape[:3]
    rolled = jnp.roll(x, shift=(-dy, -dx), axis=(1, 2))
    col = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)[None]
    row = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)[None]
    ok = (col + dx >= 0) & (col + dx < mw) & (row + dy >= 0) & (row + dy < mh)
    return rolled, ok


def _gather_map(x: jax.Array, mx: jax.Array, my: jax.Array):
    """Gather a (V, Mh, Mw, ...) field at integer grid coords (clipped)."""
    v, mh, mw = x.shape[:3]
    extra = mx.ndim - 3
    vid = jnp.arange(v, dtype=jnp.int32).reshape((v,) + (1,) * (mx.ndim - 1))
    return x[vid, jnp.clip(my, 0, mh - 1), jnp.clip(mx, 0, mw - 1)]


def _gather_view(x: jax.Array, view: jax.Array, my: jax.Array, mx: jax.Array):
    """Gather a (V, Mh, Mw, ...) field at (view, my, mx) index arrays."""
    mh, mw = x.shape[1:3]
    return x[view, jnp.clip(my, 0, mh - 1), jnp.clip(mx, 0, mw - 1)]


def _cl_round(x: jax.Array) -> jax.Array:
    """OpenCL round(): half away from zero."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


# ---------------------------------------------------------------------------
# Smoothness score (cl:1136-1254 init / cl:1407-1525 candidate-plane form)
# ---------------------------------------------------------------------------


def smoothness_score(
    ctx: RefineContext,
    tgt_d: jax.Array,  # (V, Mh, Mw) neighbor disparity field compared against
    d0: jax.Array,  # (V, Mh, Mw) candidate plane disparity at own center
    n0: jax.Array,  # (V, Mh, Mw, 3) candidate plane normal
    *,
    gamma: float,
    alpha: float,
    steps: int,
    step_size: float,
) -> jax.Array:
    """Unified smoothness: ``init_smoothness`` is this with the
    fronto-parallel candidate (n0=(0,0,1) makes the plane extrapolation
    collapse to d0, cl:1428 vs cl:1160-1162) and ``tgt_d`` = initial
    disparities; ``compute_smoothness`` is this with ``tgt_d`` = the input
    state buffer's disparities."""
    center = ctx.center
    color = ctx.color
    cxf, cyf = center[..., 0], center[..., 1]
    nx, ny, nz = n0[..., 0], n0[..., 1], n0[..., 2]

    sm = jnp.zeros_like(d0)
    wn = jnp.zeros_like(d0)

    # 8 immediate ring neighbors (static shifts); loop order is irrelevant
    # here because the accumulation is a sum.
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            c_nbr, ok = _shift_map(center, dx, dy)
            col_nbr, _ = _shift_map(color, dx, dy)
            d_nbr, _ = _shift_map(tgt_d, dx, dy)
            diff_c = jnp.sum((color - col_nbr) ** 2, axis=-1)
            sim = jnp.exp(-diff_c * gamma)
            d_intrp = (
                nx * (cxf - c_nbr[..., 0]) + ny * (cyf - c_nbr[..., 1]) + nz * d0
            ) / nz
            diff_d = d_intrp - d_nbr
            w = jnp.where(ok, sim, 0.0)
            sm = sm + w * jnp.exp(-diff_d * diff_d * alpha)
            wn = wn + w

    # Long-range taps at flatness-scaled pitch (cl:1169-1246 / cl:1437-1519).
    v, mh, mw = d0.shape
    colg = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)[None]
    rowg = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)[None]
    step_sz = jnp.maximum(
        1, (ctx.fl[..., 0] * step_size + 0.5).astype(jnp.int32)
    )  # (V, Mh, Mw), C trunc cast of fl.x*kss+0.5 == round for positives

    for i in range(1, steps + 1):
        gamma_i = gamma * (1 + i)
        step = i * step_sz
        for axis, sign in ((0, -1), (0, 1), (1, -1), (1, 1)):
            # order Left, Right, Up, Down (cl:1176-1245); sum-commutative
            off = step + 1
            if axis == 0:
                tx = colg + sign * off
                ty = rowg + jnp.zeros_like(step)
                ok = jnp.where(sign < 0, colg > step, colg < mw - step - 1)
            else:
                tx = colg + jnp.zeros_like(step)
                ty = rowg + sign * off
                ok = jnp.where(sign < 0, rowg > step, rowg < mh - step - 1)
            c_t = _gather_map(center, tx, ty)
            col_t = _gather_map(color, tx, ty)
            d_t = _gather_map(tgt_d, tx, ty)
            diff_c = jnp.sum((color - col_t) ** 2, axis=-1)
            sim = jnp.exp(-diff_c * gamma_i)
            d_extp = (
                nx * (cxf - c_t[..., 0]) + ny * (cyf - c_t[..., 1]) + nz * d0
            ) / nz
            diff_d = d_extp - d_t
            w = jnp.where(ok, sim, 0.0)
            sm = sm + w * jnp.exp(-diff_d * diff_d * alpha)
            wn = wn + w

    return jnp.where(wn > 0, sm / wn, _EPS_SM)


# ---------------------------------------------------------------------------
# Consistency score (cl:1260-1357 init / cl:1528-1631 candidate-plane form)
# ---------------------------------------------------------------------------


def consistency_score(
    ctx: RefineContext,
    tgt_d: jax.Array,  # (V, Mh, Mw) stored plane disparity per superpixel
    tgt_n: jax.Array,  # (V, Mh, Mw, 3) stored plane normal per superpixel
    d0: jax.Array,
    n0: jax.Array,
    *,
    gamma: float,
    alpha: float,
    fuse: float,
    bl_ratio: float,
) -> jax.Array:
    """Unified consistency: ``initialize_consistency`` is this with
    fronto-parallel candidate and stored planes; ``compute_consistency``
    with live candidate/stored planes."""
    h, w = ctx.img_hw
    mh, mw = ctx.center.shape[1:3]
    center = ctx.center
    color = ctx.color
    max_n = ctx.view_subset.shape[1]

    # 9 sample points: xy = (int)center + offset (cl:1567-1569)
    cx_i = center[..., 0].astype(jnp.int32)[..., None]  # (V,Mh,Mw,1)
    cy_i = center[..., 1].astype(jnp.int32)[..., None]
    sx = cx_i + ctx.samples[..., 0]  # (V, Mh, Mw, 9)
    sy = cy_i + ctx.samples[..., 1]

    # plane interpolation at each sample (cl:1572)
    nx = n0[..., 0:1]
    ny = n0[..., 1:2]
    nz = n0[..., 2:3]
    d_intrp = (
        nx * (center[..., 0:1] - sx.astype(jnp.float32))
        + ny * (center[..., 1:2] - sy.astype(jnp.float32))
        + nz * d0[..., None]
    ) / nz  # (V, Mh, Mw, 9)

    consistency = jnp.zeros_like(d0)
    view_counter = jnp.zeros_like(d0)

    for k in range(max_n):
        view = jnp.clip(ctx.view_subset[:, k], 0, ctx.center.shape[0] - 1)
        slot_ok = (ctx.view_subset[:, k] >= 0)[:, None, None]
        dvx = ctx.dv[:, k, 0][:, None, None, None]
        dvy = ctx.dv[:, k, 1][:, None, None, None]

        xp = sx - _cl_round(d_intrp * dvx).astype(jnp.int32)
        yp = sy - _cl_round(bl_ratio * d_intrp * dvy).astype(jnp.int32)
        inb = (xp >= 0) & (yp >= 0) & (xp < w) & (yp < h)

        view_b = view[:, None, None, None]
        idx_proj = _gather_view(
            ctx.labels, jnp.broadcast_to(view_b, xp.shape),
            jnp.clip(yp, 0, h - 1), jnp.clip(xp, 0, w - 1),
        )  # labels are (V,H,W): gather at pixel coords
        pmx = idx_proj % mw
        pmy = idx_proj // mw

        viewg = jnp.broadcast_to(view_b, pmx.shape)
        c_proj = _gather_view(ctx.color, viewg, pmy, pmx)  # (V,Mh,Mw,9,3)
        ctr_proj = _gather_view(center, viewg, pmy, pmx)
        d_proj = _gather_view(tgt_d, viewg, pmy, pmx)  # (V,Mh,Mw,9)
        n_proj = _gather_view(tgt_n, viewg, pmy, pmx)  # (V,Mh,Mw,9,3)

        d_intrp_proj = (
            n_proj[..., 0] * (ctr_proj[..., 0] - xp.astype(jnp.float32))
            + n_proj[..., 1] * (ctr_proj[..., 1] - yp.astype(jnp.float32))
            + n_proj[..., 2] * d_proj
        ) / n_proj[..., 2]

        diff = d_intrp_proj - d_intrp
        when_visible = (jnp.abs(diff) < fuse).astype(jnp.float32)
        inbf = inb.astype(jnp.float32)
        visible = jnp.sum(
            inbf * when_visible * jnp.exp(-diff * diff * alpha), axis=-1
        )
        visib_sum = jnp.sum(inbf * when_visible, axis=-1)
        occl_sum = jnp.sum(inbf * (1.0 - when_visible), axis=-1)
        cdiff = jnp.sum((c_proj - color[..., None, :]) ** 2, axis=-1)
        visibility = jnp.sum(inbf * jnp.exp(-cdiff * gamma), axis=-1)
        num = jnp.sum(inbf, axis=-1)

        has = (num > 0) & jnp.broadcast_to(slot_ok, num.shape)
        contrib = jnp.where(
            (visib_sum > 0) & has,
            (visib_sum / jnp.maximum(num, 1.0))
            * (visibility / jnp.maximum(visib_sum, 1e-30))
            * (visible / jnp.maximum(visib_sum, 1e-30)),
            0.0,
        )
        contrib = contrib + jnp.where(
            (occl_sum > 0) & has, 0.5 * ctx.fl[..., 1], 0.0
        )
        consistency = consistency + contrib
        view_counter = view_counter + has.astype(jnp.float32)

    return jnp.where(
        view_counter > 0,
        jnp.maximum(_MARGIN, consistency / jnp.maximum(view_counter, 1.0)),
        _MARGIN,
    )


# ---------------------------------------------------------------------------
# State init (cl:1362-1404)
# ---------------------------------------------------------------------------


_FRONTO = (0.0, 0.0, 1.0)


def init_state(
    ctx: RefineContext,
    *,
    gamma: float,
    alpha: float,
    fuse: float,
    bl_ratio: float,
    steps: int,
    step_size: float,
) -> RefineState:
    """``init_current_state``: score the initial fronto-parallel planes."""
    d0 = ctx.disp0
    n0 = jnp.broadcast_to(
        jnp.asarray(_FRONTO, jnp.float32), d0.shape + (3,)
    )
    sm = smoothness_score(
        ctx, ctx.disp0, d0, n0, gamma=gamma, alpha=alpha, steps=steps, step_size=step_size
    )
    cs = consistency_score(
        ctx, ctx.disp0, n0, d0, n0, gamma=gamma, alpha=alpha, fuse=fuse, bl_ratio=bl_ratio
    )
    return RefineState(d=d0, sm=sm, cs=cs, n=n0)


# ---------------------------------------------------------------------------
# Propagation (cl:1727-1900)
# ---------------------------------------------------------------------------

# Ring neighbor order of the refinement stage (cl:1865-1873), (dx, dy).
_RING = ((-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1))

_KIND_UPDATE = 0
_KIND_REFINE = 1


def _move_table(steps: int, step_size: float) -> jnp.ndarray:
    """Static move list for one propagation iteration:
    8 immediate ``update`` moves (cl:1768-1787), then per reach step the
    UP/DOWN/LEFT/RIGHT long-range ``update`` moves (cl:1793-1857), then the
    8 ``spatialRefinement`` ring-pair moves (cl:1875-1891).

    Each row: (kind, dx1, dy1, dx2, dy2).
    """
    rows: list[tuple[int, int, int, int, int]] = []
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            if i == 0 and j == 0:
                continue
            rows.append((_KIND_UPDATE, i, j, 0, 0))
    pitch = int(step_size)  # (int)(kernel_step_size), cl:1791
    for i in range(1, steps + 1):
        off = i * pitch + 1
        rows.append((_KIND_UPDATE, 0, -off, 0, 0))  # UP
        rows.append((_KIND_UPDATE, 0, off, 0, 0))  # DOWN
        rows.append((_KIND_UPDATE, -off, 0, 0, 0))  # LEFT
        rows.append((_KIND_UPDATE, off, 0, 0, 0))  # RIGHT
    for r in range(8):
        dx1, dy1 = _RING[r]
        dx2, dy2 = _RING[(r + 1) % 8]
        rows.append((_KIND_REFINE, dx1, dy1, dx2, dy2))
    return jnp.asarray(rows, jnp.int32)


def _cross(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Correct 3-vector cross product (device ``cross_product_test``,
    cl:1676-1685 — NOT the buggy host ``crossVec3f``)."""
    return jnp.stack(
        [
            v1[..., 1] * v2[..., 2] - v1[..., 2] * v2[..., 1],
            v2[..., 0] * v1[..., 2] - v1[..., 0] * v2[..., 2],
            v1[..., 0] * v2[..., 1] - v1[..., 1] * v2[..., 0],
        ],
        axis=-1,
    )


def propagate_iteration(
    ctx: RefineContext,
    state_in: RefineState,
    it: int,
    *,
    gamma: float,
    alpha: float,
    fuse: float,
    bl_ratio: float,
    steps: int,
    step_size: float,
) -> RefineState:
    """One Jacobi sweep: every superpixel walks the move table, rescoring
    candidate planes against the *input* state (ping-pong semantics of
    depth_refinement.cpp:744-753)."""
    v, mh, mw = state_in.d.shape
    colg = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)[None]
    rowg = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)[None]
    center = ctx.center
    color = ctx.color
    greedy = it < 4  # cl:1663 / cl:1713

    score_sm = partial(
        smoothness_score,
        ctx,
        state_in.d,
        gamma=gamma,
        alpha=alpha,
        steps=steps,
        step_size=step_size,
    )
    score_cs = partial(
        consistency_score,
        ctx,
        state_in.d,
        state_in.n,
        gamma=gamma,
        alpha=alpha,
        fuse=fuse,
        bl_ratio=bl_ratio,
    )

    def move_body(carry, row):
        d0, sm0, cs0, n0 = carry
        kind, dx1, dy1, dx2, dy2 = row[0], row[1], row[2], row[3], row[4]

        tx1, ty1 = colg + dx1, rowg + dy1
        ok1 = (tx1 >= 0) & (ty1 >= 0) & (tx1 < mw) & (ty1 < mh)
        tx2, ty2 = colg + dx2, rowg + dy2
        ok2 = (tx2 >= 0) & (ty2 >= 0) & (tx2 < mw) & (ty2 < mh)

        # --- update-move candidate: adopt neighbor plane (cl:1639-1649)
        n1 = _gather_map(state_in.n, tx1, ty1)
        d1 = _gather_map(state_in.d, tx1, ty1)
        c1 = _gather_map(center, tx1, ty1)
        col1 = _gather_map(color, tx1, ty1)
        d_adopt = (
            n1[..., 0] * (c1[..., 0] - center[..., 0])
            + n1[..., 1] * (c1[..., 1] - center[..., 1])
            + n1[..., 2] * d1
        ) / n1[..., 2]
        sim = jnp.exp(-jnp.sum((color - col1) ** 2, axis=-1) * gamma)

        # --- refine-move candidate: plane through self + 2 ring neighbors
        # (cl:1691-1702); neighbor z comes from the *input* state.
        c2 = _gather_map(center, tx2, ty2)
        z2 = _gather_map(state_in.d, tx2, ty2)
        v1 = jnp.stack(
            [c1[..., 0] - center[..., 0], c1[..., 1] - center[..., 1], d1 - d0],
            axis=-1,
        )
        v2 = jnp.stack(
            [c2[..., 0] - center[..., 0], c2[..., 1] - center[..., 1], z2 - d0],
            axis=-1,
        )
        n_fit = _cross(v1, v2)
        n_fit = n_fit / jnp.linalg.norm(n_fit, axis=-1, keepdims=True)

        is_upd = kind == _KIND_UPDATE
        n_cand = jnp.where(is_upd, n1, n_fit)
        d_cand = jnp.where(is_upd, d_adopt, d0)
        valid = jnp.where(is_upd, ok1, ok1 & ok2)

        sm1 = score_sm(d_cand, n_cand)
        cs1 = score_cs(d_cand, n_cand)

        accept_u = (greedy & (sm1 * sim > sm0)) | (cs1 * sm1 > sm0 * cs0)
        accept_r = (greedy & (sm1 > sm0)) | (sm1 * cs1 > sm0 * cs0)
        accept = valid & jnp.where(is_upd, accept_u, accept_r)

        d0 = jnp.where(accept, d_cand, d0)
        sm0 = jnp.where(accept, sm1, sm0)
        cs0 = jnp.where(accept, cs1, cs0)
        n0 = jnp.where(accept[..., None], n_cand, n0)
        return (d0, sm0, cs0, n0), None

    table = _move_table(steps, step_size)
    carry0 = (state_in.d, state_in.sm, state_in.cs, state_in.n)
    (d0, sm0, cs0, n0), _ = jax.lax.scan(move_body, carry0, table)
    return RefineState(d=d0, sm=sm0, cs=cs0, n=n0)


def refine(
    ctx: RefineContext,
    schedule,
    *,
    jit: bool = True,
) -> RefineState:
    """Full refinement: init state, then ``no_prop`` Jacobi sweeps with
    decaying reach (depth_refinement.cpp:105-106, 767-769)."""
    kw0 = dict(
        gamma=schedule.gamma_eff,
        alpha=schedule.alpha_eff,
        fuse=schedule.fuse_eff,
        bl_ratio=schedule.bl_ratio,
    )
    init = partial(
        init_state,
        **kw0,
        steps=schedule.kernel_steps,
        step_size=schedule.sp_kernel_step,
    )
    state = jax.jit(init)(ctx) if jit else init(ctx)
    for it in range(schedule.no_prop):
        step_fn = partial(
            propagate_iteration,
            it=it,
            **kw0,
            steps=schedule.steps_per_iter[it],
            step_size=schedule.step_size_per_iter[it],
        )
        state = jax.jit(step_fn)(ctx, state) if jit else step_fn(ctx, state)
    return state
