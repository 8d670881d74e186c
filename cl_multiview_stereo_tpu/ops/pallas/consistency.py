"""Strip-staged PatchMatch consistency scoring for ALL moves of one sweep.

Behavioral spec: ``compute_consistency`` (``clMVDE/clcode.cl:1528-1631``) —
the same semantics as ``refine.consistency_from_cache`` (the per-move XLA
gather form), restructured around two measured TPU facts (BASELINE.md
round-4 gather ladder + Mosaic probes):

  * a gathered row of ~104-128 f32 moves at the same ~200 M rows/s issue
    rate as a 4 f32 row (~25x the effective bandwidth), and
  * ``tpu.dynamic_gather`` (Pallas ``take_along_axis`` over 128 lanes)
    resolves in-VMEM lane lookups at ~6 G/s, ~45x the HBM gather rate.

Design: the rasterized state table (``cache.ras``, (V*H*W, 4) interleaved
[disp, L, a, b]) is reshaped so each image row (or column, for vertical
pairs) is one strip source.  For every (pair, cell, sample) ONE gathered
128-f32 row carries a 32-position x 4-channel window positioned to cover
every candidate plane's projected position (the base adapts per row to the
candidates' rounded disparities, anchored at the frozen state's own).  A
Pallas kernel resolves every (move, channel) value with a single 128-lane
``take_along_axis`` per row and emits the three per-(sample, move) terms
of the consistency formula; sample/pair/view aggregation happens outside
in the exact reference order.  Lookups outside the window ("escapes":
candidate spread wider than the full reference ladder, or plane blowups)
are fixed up EXACTLY by a block-compacted narrow gather — never
approximated; a static block budget bounds the fixup cost and an overflow
count is accumulated for the debug path.

Scope: pairs with axis-aligned unit grid deltas (dvy = 0, |dvx| = 1 or
dvx = 0, |dvy| = 1) run through the strip kernel; any other pair class
(diagonals, generalized SfM deltas) goes through the exact XLA gather
path, move-batched.  Both engines produce the same five per-pair partial
sums, merged in the ORIGINAL subset order so the floating-point
aggregation matches ``consistency_from_cache``.

Known deviation (pipeline-equivalent, see tests): candidates whose plane
blows up (non-finite interpolated disparity) contribute 0 here, where the
XLA path reads a deterministic-garbage clipped pixel.  Such candidates
score NaN smoothness, so the acceptance chain (cl:1663) rejects them under
either engine and the refined state is identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MARGIN = 0.01
_WIN = 32  # strip window positions (x4 interleaved channels = 128 lanes)
_LANES = 4 * _WIN
_MOVE_SLOTS = 32  # move lane slots (M <= 32)
_ROW_TILE = 512  # kernel rows per grid step
_ESC_BLOCK = 256  # escape-compaction block size (flat entries)
_ESC_BLOCKS = 768  # escape blocks re-evaluated per pair-chunk (static cap)
# pairs staged per scan step (bounds live strip memory: each chunk holds
# ~4 x (chunk * Mh * 9 * Mw, 128) f32 arrays — ~600 MB/pair at 1080p).
# Compile-time constant: changing it requires a fresh process (it shapes
# every traced program in this module).
_PAIR_CHUNK = 3

# PROBE-ONLY (tools/probe_cons_bisect.py): trace the engine WITHOUT the
# exact escape fixup to localize the full-scale axon worker crash.  Output
# is then NOT exact — never set outside a crash-bisection process.
_DISABLE_ESC_FIXUP = False


def _cl_round(x):
    """OpenCL round(): half away from zero."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def classify_pairs(pairs: tuple):
    """Split the static pair list into strip-eligible horizontal/vertical
    classes and the XLA-path remainder (position lists into ``pairs``)."""
    h_idx, v_idx, rest = [], [], []
    for i, (_, _, dvx, dvy) in enumerate(pairs):
        if dvy == 0.0 and abs(dvx) == 1.0:
            h_idx.append(i)
        elif dvx == 0.0 and abs(dvy) == 1.0:
            v_idx.append(i)
        else:
            rest.append(i)
    return h_idx, v_idx, rest


# ---------------------------------------------------------------------------
# Pallas kernel: strip lookup + per-(sample, move) terms
# ---------------------------------------------------------------------------


def _terms_kernel(lo_ref, hi_ref, idx_ref, aux_ref, out_ref, *, gamma, alpha, fuse):
    """Per row r (= one (pair, cell, sample)) and lane layout c*32+m:

    in : [lo|hi][r, :] = UNROTATED aligned 2*_LANES strip (two 128-lane
         refs: tpu.dynamic_gather cannot cross 128 lanes); the window
         rotation is folded into idx, so the lane gather rotates for free
         idx[r, c*32+m]    = rot(r) + 4*off(r, m)+c in [0, 2*_LANES), or -1
         aux[r, 0:32]      = dip(r, m);  aux[r, 32c+m] = colp_c (c >= 1)
    out: [0:32)  wv = ok * (|d_look - dip| < fuse)
         [32:64) e1 = wv * exp(-diff^2 * alpha)
         [64:96) e2 = ok * exp(-cdiff * gamma)
    """
    idx = idx_ref[:]
    ok = idx >= 0
    v_lo = jnp.take_along_axis(lo_ref[:], jnp.clip(idx, 0, _LANES - 1), axis=1)
    v_hi = jnp.take_along_axis(
        hi_ref[:], jnp.clip(idx - _LANES, 0, _LANES - 1), axis=1
    )
    val = jnp.where(idx < _LANES, v_lo, v_hi)
    t = val - aux_ref[:]
    tsq = jnp.where(ok, t * t, 0.0)
    # color distance: fold the three c>=1 groups down onto lanes [0:32)
    # (pltpu.roll is circular with non-negative shift: -32 == +96 mod 128)
    cd = (
        pltpu.roll(tsq, 96, 1) + pltpu.roll(tsq, 64, 1) + pltpu.roll(tsq, 32, 1)
    )
    okf = ok.astype(jnp.float32)
    wv = okf * (jnp.abs(t) < fuse).astype(jnp.float32)
    e1 = wv * jnp.exp(-tsq * alpha)
    e2 = okf * jnp.exp(-cd * gamma)
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    m0 = (lane < _MOVE_SLOTS).astype(jnp.float32)
    out_ref[:] = (
        m0 * wv + pltpu.roll(m0 * e1, 32, 1) + pltpu.roll(m0 * e2, 64, 1)
    )


def _run_terms_xla(lo, hi, idx, aux, *, gamma, alpha, fuse):
    """Pure-XLA twin of ``_terms_kernel`` (bitwise-equal; differential test
    in tests/test_consistency_strips.py) — an alternative lane backend for
    environments where the Mosaic path misbehaves."""
    ok = idx >= 0
    v_lo = jnp.take_along_axis(lo, jnp.clip(idx, 0, _LANES - 1), axis=1)
    v_hi = jnp.take_along_axis(hi, jnp.clip(idx - _LANES, 0, _LANES - 1), axis=1)
    val = jnp.where(idx < _LANES, v_lo, v_hi)
    t = val - aux
    tsq = jnp.where(ok, t * t, 0.0)
    cd = (
        jnp.roll(tsq, 96, axis=1)
        + jnp.roll(tsq, 64, axis=1)
        + jnp.roll(tsq, 32, axis=1)
    )
    okf = ok.astype(jnp.float32)
    wv = okf * (jnp.abs(t) < fuse).astype(jnp.float32)
    e1 = wv * jnp.exp(-tsq * alpha)
    e2 = okf * jnp.exp(-cd * gamma)
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    m0 = (lane < _MOVE_SLOTS).astype(jnp.float32)
    return (
        m0 * wv + jnp.roll(m0 * e1, 32, axis=1) + jnp.roll(m0 * e2, 64, axis=1)
    )


def _run_terms(lo, hi, idx, aux, *, gamma, alpha, fuse, interpret=False,
               lane_backend: str = "pallas"):
    """lo/hi/idx/aux: (R, 128) with R a multiple of _ROW_TILE."""
    if lane_backend == "xla":
        return _run_terms_xla(lo, hi, idx, aux, gamma=gamma, alpha=alpha,
                              fuse=fuse)
    r = lo.shape[0]
    interpret = interpret or jax.default_backend() != "tpu"
    kern = partial(_terms_kernel, gamma=gamma, alpha=alpha, fuse=fuse)
    bspec = pl.BlockSpec(
        (_ROW_TILE, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
        grid=(r // _ROW_TILE,),
        in_specs=[bspec, bspec, bspec, bspec],
        out_specs=bspec,
        interpret=interpret,
    )(lo, hi, idx, aux)


# ---------------------------------------------------------------------------
# Strip staging + exact escape fixup (XLA)
# ---------------------------------------------------------------------------


def _strip_gather(table, row_id, col_start):
    """Gather the ALIGNED 2*_LANES-wide block pair covering the _LANES
    window at (row_id, col_start) from a (rows, cols*4) interleaved table.

    Returns ``(lo, hi, rot)``: two (..., _LANES) UNROTATED halves plus the
    window's offset into them — the lane-gather kernel folds ``rot`` into
    its indices, so no rotation pass exists at all.

    Why not one gather at the exact column?  ``lax.gather`` with slice
    (1, _LANES) at arbitrary offsets lowers to a scalar DMA path at
    0.4 M rows/s / 0.2 GiB/s (round-5 probe, ~500x below the full-row
    take rate); a full-scale sweep then runs for minutes and the axon
    watchdog kills the worker — THE root cause of the rounds-3/5 strips
    "crashes".  Full-row takes of an overlapped (rows*B, 2*_LANES) block
    table hit the measured fast gather path instead."""
    rows, cols = table.shape
    b_cnt = -(-cols // _LANES) + 1  # one extra block: the overlap's wrap
    tp = jnp.pad(table, ((0, 0), (0, b_cnt * _LANES - cols)))
    a = tp.reshape(rows, b_cnt, _LANES)
    blocks = jnp.concatenate([a, jnp.roll(a, -1, axis=1)], axis=-1)
    flat = blocks.reshape(rows * b_cnt, 2 * _LANES)
    b = jnp.clip(col_start // _LANES, 0, b_cnt - 1)
    rot = jnp.clip(col_start - b * _LANES, 0, _LANES - 1)
    w2 = flat[(row_id * b_cnt + b).reshape(-1)].reshape(
        row_id.shape + (2 * _LANES,)
    )
    return (
        jax.lax.slice_in_dim(w2, 0, _LANES, axis=-1),
        jax.lax.slice_in_dim(w2, _LANES, 2 * _LANES, axis=-1),
        rot,
    )


def _class_sums(
    ras_flat,  # (V*H*W, 4) packed [disp, L, a, b] per pixel
    table,  # (V*A, 4*B) strip source: (A, B) = (H, W) for h, (W, H) for v
    img_hw: tuple[int, int],
    is_v: bool,
    class_pairs: np.ndarray,  # (Pc, 3) host-side [z, n, sign]
    sx, sy,  # (V, Mh, 9, Mw) int32 move-independent sample positions
    q_all,  # (V, Mh, 9, Mw, 32) int32 rounded shift (h: round(dip),
    #         v: round(bl*dip)); junk where not finite
    q_state,  # (V, Mh, 9, Mw) int32 same rounding of the FROZEN state's dip
    dip_all,  # (V, Mh, 9, Mw, 32) f32 candidate plane disparity at sample
    finite_all,  # (V, Mh, 9, Mw, 32) bool: dip finite
    colp,  # (V, Mh, Mw, 3) f32 reference superpixel color
    n_moves: int,
    *,
    gamma, alpha, fuse,
    interpret: bool = False,
    lane_backend: str = "pallas",
):
    """The five consistency partial sums for one strip class, all moves at
    once.  Returns ((num, visib_sum, visible, visibility, occl_sum) each
    (Pc, Mh, Mw, 32), escape_overflow_count)."""
    v, mh, _, mw = sx.shape[:4]
    h_img, w_img = img_hw
    a_dim = w_img if is_v else h_img  # table rows per view
    b_dim = h_img if is_v else w_img  # positions along the strip axis
    if table.shape[1] < _LANES:  # tiny images: gather slice must fit
        table = jnp.pad(table, ((0, 0), (0, _LANES - table.shape[1])))
    n_pairs = class_pairs.shape[0]

    n_chunks = -(-n_pairs // _PAIR_CHUNK)
    pad_p = n_chunks * _PAIR_CHUNK - n_pairs
    refs_c = np.pad(class_pairs[:, 0], (0, pad_p)).reshape(n_chunks, _PAIR_CHUNK)
    nbrs_c = np.pad(class_pairs[:, 1], (0, pad_p)).reshape(n_chunks, _PAIR_CHUNK)
    signs_c = np.pad(
        class_pairs[:, 2], (0, pad_p), constant_values=1
    ).reshape(n_chunks, _PAIR_CHUNK)
    validp_c = np.pad(
        np.ones(n_pairs, np.bool_), (0, pad_p)
    ).reshape(n_chunks, _PAIR_CHUNK)

    rc_rows = _PAIR_CHUNK * mh * 9 * mw
    rc_pad = (-rc_rows) % _ROW_TILE
    n_flat = rc_rows * _MOVE_SLOTS
    n_blocks = -(-n_flat // _ESC_BLOCK)
    flat_pad = n_blocks * _ESC_BLOCK - n_flat
    k_blocks = min(_ESC_BLOCKS, n_blocks)
    move_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, _MOVE_SLOTS), 4)
        < n_moves
    )
    iota4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 4, 1), 4)

    def chunk_body(esc_overflow, xs):
        refs_k, nbrs_k, signs_k, validp_k = xs
        take = lambda arr: jnp.take(arr, refs_k, axis=0)
        sxp, syp = take(sx), take(sy)  # (C, Mh, 9, Mw)
        qp = take(q_all)  # (C, Mh, 9, Mw, 32)
        dipp = take(dip_all)
        finp = take(finite_all)
        qst = take(q_state)  # (C, Mh, 9, Mw)
        sgn = signs_k[:, None, None, None, None]
        fix_pos = sxp if is_v else syp  # move-independent axis
        strip_pos0 = syp if is_v else sxp
        pos = strip_pos0[..., None] - sgn * qp  # projected strip-axis coord
        fix_ok = (fix_pos >= 0) & (fix_pos < a_dim)
        inb = (
            finp & (pos >= 0) & (pos < b_dim) & fix_ok[..., None]
            & validp_k[:, None, None, None, None] & move_ok
        )
        # adaptive window base: min candidate q within _WIN of the state's
        # own (far/blown-up candidates escape instead of dragging the base)
        near = finp & (jnp.abs(qp - qst[..., None]) < _WIN) & move_ok
        q_min = jnp.min(
            jnp.where(near, qp, qst[..., None] + (_WIN - 1)), axis=-1
        )
        q_min = jnp.minimum(q_min, qst)
        start_lo = jnp.where(
            signs_k[:, None, None, None] > 0,
            strip_pos0 - q_min - (_WIN - 1),
            strip_pos0 + q_min,
        )
        # images narrower than the window: one whole-axis strip from 0
        # (the table is padded to >= _LANES columns; pad lanes unreachable
        # because inb bounds pos < b_dim)
        start_lo = jnp.clip(start_lo, 0, max(b_dim - _WIN, 0))
        off = pos - start_lo[..., None]  # window position
        esc = inb & ((off < 0) | (off >= _WIN))
        ok = inb & ~esc

        # ---- staging gather: aligned block pair per (pair, cell, sample) -
        row_id = nbrs_k[:, None, None, None] * a_dim + jnp.clip(
            fix_pos, 0, a_dim - 1
        )
        s_lo, s_hi, rot = _strip_gather(table, row_id, 4 * start_lo)

        # ---- kernel inputs (window rotation folded into the indices) -----
        idx = jnp.where(ok, 4 * off + rot[..., None], -1)  # (C, Mh, 9, Mw, 32)
        idx4 = jnp.where(
            idx[..., None, :] >= 0, idx[..., None, :] + iota4, -1
        )  # (C, Mh, 9, Mw, 4, 32): lane c*32+m
        colp_k = take(colp)  # (C, Mh, Mw, 3)
        aux = jnp.concatenate(
            [
                jnp.where(ok, dipp, 0.0)[..., None, :],
                jnp.broadcast_to(
                    colp_k[:, :, None, :, :, None],
                    idx.shape[:4] + (3, _MOVE_SLOTS),
                ),
            ],
            axis=4,
        )  # (C, Mh, 9, Mw, 4, 32)

        pad2 = lambda a, cv: jnp.pad(
            a.reshape(-1, _LANES), ((0, rc_pad), (0, 0)), constant_values=cv
        )
        out = _run_terms(
            pad2(s_lo, 0), pad2(s_hi, 0), pad2(idx4, -1), pad2(aux, 0),
            gamma=gamma, alpha=alpha, fuse=fuse, interpret=interpret,
            lane_backend=lane_backend,
        )[:rc_rows].reshape(_PAIR_CHUNK, mh, 9, mw, _LANES)
        wv = out[..., 0:_MOVE_SLOTS]
        e1 = out[..., _MOVE_SLOTS : 2 * _MOVE_SLOTS]
        e2 = out[..., 2 * _MOVE_SLOTS : 3 * _MOVE_SLOTS]

        # ---- sample aggregation (same 9-term sum as the XLA path) --------
        inbf = inb.astype(jnp.float32)
        num = jnp.sum(inbf, axis=2)  # (C, Mh, Mw, 32)
        visib_sum = jnp.sum(wv, axis=2)
        visible = jnp.sum(e1, axis=2)
        visibility = jnp.sum(e2, axis=2)

        # ---- exact escape fixup (block-compacted narrow gather) ----------
        if _DISABLE_ESC_FIXUP:  # crash-bisection probes only
            occl_sum = num - visib_sum
            return esc_overflow, (num, visib_sum, visible, visibility, occl_sum)
        esc_flat = esc.reshape(-1)
        if flat_pad:
            esc_flat = jnp.pad(esc_flat, (0, flat_pad))
        flags = jnp.any(esc_flat.reshape(n_blocks, _ESC_BLOCK), axis=1)
        esc_overflow = esc_overflow + jnp.maximum(
            jnp.sum(flags.astype(jnp.int32)) - k_blocks, 0
        )
        _, blk_ids = jax.lax.top_k(flags.astype(jnp.int32), k_blocks)
        ent = (
            blk_ids[:, None] * _ESC_BLOCK
            + jnp.arange(_ESC_BLOCK, dtype=jnp.int32)[None, :]
        ).reshape(-1)  # flat (pair, mh, 9, mw, move) entry ids
        g = lambda arr: arr.reshape(-1)[ent]
        wmask = g(esc_flat).astype(jnp.float32)
        e_dip = g(dipp)
        e_pos = g(pos)
        e_fix = g(jnp.broadcast_to(fix_pos[..., None], dipp.shape))
        e_nbr = g(jnp.broadcast_to(nbrs_k[:, None, None, None, None], dipp.shape))
        m_id = ent % _MOVE_SLOTS
        mw_id = (ent // _MOVE_SLOTS) % mw
        mh_id = (ent // (_MOVE_SLOTS * mw * 9)) % mh
        p_id = ent // (_MOVE_SLOTS * mw * 9 * mh)
        e_x = jnp.where(is_v, e_fix, e_pos)
        e_y = jnp.where(is_v, e_pos, e_fix)
        flat_pos = (
            e_nbr * (h_img * w_img)
            + jnp.clip(e_y, 0, h_img - 1) * w_img
            + jnp.clip(e_x, 0, w_img - 1)
        )
        vals = ras_flat[flat_pos]  # (K, 4)
        diff = vals[..., 0] - e_dip
        wv_e = (jnp.abs(diff) < fuse).astype(jnp.float32)
        e1_e = wv_e * jnp.exp(-diff * diff * alpha)
        cdiff = jnp.sum((vals[..., 1:4] - colp_k[p_id, mh_id, mw_id]) ** 2, -1)
        e2_e = jnp.exp(-cdiff * gamma)
        agg_idx = ((p_id * mh + mh_id) * mw + mw_id) * _MOVE_SLOTS + m_id
        add = lambda acc, val_: acc.reshape(-1).at[agg_idx].add(
            wmask * val_
        ).reshape(acc.shape)
        visib_sum = add(visib_sum, wv_e)
        visible = add(visible, e1_e)
        visibility = add(visibility, e2_e)
        occl_sum = num - visib_sum
        return esc_overflow, (num, visib_sum, visible, visibility, occl_sum)

    esc_overflow, sums = jax.lax.scan(
        chunk_body,
        jnp.int32(0),
        tuple(
            jnp.asarray(a, jnp.int32) if a.dtype != np.bool_ else jnp.asarray(a)
            for a in (refs_c, nbrs_c, signs_c, validp_c)
        ),
    )
    sums = tuple(
        s.reshape(n_chunks * _PAIR_CHUNK, mh, mw, _MOVE_SLOTS)[:n_pairs]
        for s in sums
    )
    return sums, esc_overflow


# ---------------------------------------------------------------------------
# XLA-path engine (non-strip pairs: diagonals, generalized SfM deltas)
# ---------------------------------------------------------------------------


def _pair_sums_xla(
    ras_flat, img_hw, rest_pairs: tuple, sx, sy, dip_all, colp, n_moves: int,
    *, gamma, alpha, fuse, bl_ratio,
):
    """The same five partial sums via the exact per-move packed gather
    (identical math to refine.consistency_from_cache, cl:1581-1597) for an
    arbitrary pair subset, scanned over moves.  ``dip_all``: the shared
    (V, Mh, 9, Mw, 32) candidate-plane disparities.  Returns 5 arrays
    (Pr, Mh, Mw, 32) (unused move lanes zero)."""
    h, w = img_hw
    refs = jnp.asarray([p[0] for p in rest_pairs], jnp.int32)
    nbrs = jnp.asarray([p[1] for p in rest_pairs], jnp.int32)
    dvx = jnp.asarray([p[2] for p in rest_pairs], jnp.float32)[:, None, None, None]
    dvy = jnp.asarray([p[3] for p in rest_pairs], jnp.float32)[:, None, None, None]
    take = lambda a: jnp.take(a, refs, axis=0)
    sxp, syp = take(sx), take(sy)  # (Pr, Mh, 9, Mw)
    colp_p = take(colp)  # (Pr, Mh, Mw, 3)
    viewb = nbrs[:, None, None, None]

    def one_move(_, m):
        # slice the move lane BEFORE expanding to the pair axis: taking
        # (Pr, Mh, 9, Mw, 32) up front is a ~35 GB temp at the 49-view 2K
        # BASELINE config-4 scale (tools/memcheck.py attribution)
        dip = take(
            jax.lax.dynamic_index_in_dim(dip_all, m, axis=-1, keepdims=False)
        )  # (Pr, Mh, 9, Mw)
        xp = sxp - _cl_round(dip * dvx).astype(jnp.int32)
        yp = syp - _cl_round(bl_ratio * dip * dvy).astype(jnp.int32)
        inb = (xp >= 0) & (yp >= 0) & (xp < w) & (yp < h)
        flat = (
            viewb * (h * w) + jnp.clip(yp, 0, h - 1) * w + jnp.clip(xp, 0, w - 1)
        )
        g = ras_flat[flat.reshape(-1)].reshape(flat.shape + (4,))
        diff = g[..., 0] - dip
        wvis = (jnp.abs(diff) < fuse).astype(jnp.float32)
        inbf = inb.astype(jnp.float32)
        visible = jnp.sum(inbf * wvis * jnp.exp(-diff * diff * alpha), axis=2)
        visib_sum = jnp.sum(inbf * wvis, axis=2)
        occl_sum = jnp.sum(inbf * (1.0 - wvis), axis=2)
        cdiff = sum(
            (g[..., 1 + c] - colp_p[..., c][:, :, None, :]) ** 2 for c in range(3)
        )
        visibility = jnp.sum(inbf * jnp.exp(-cdiff * gamma), axis=2)
        num = jnp.sum(inbf, axis=2)
        return 0, (num, visib_sum, visible, visibility, occl_sum)

    _, sums = jax.lax.scan(
        one_move, 0, jnp.arange(n_moves, dtype=jnp.int32)
    )  # each (M, Pr, Mh, Mw)
    pad = _MOVE_SLOTS - n_moves

    def fin(s):
        s = jnp.moveaxis(s, 0, -1)  # (Pr, Mh, Mw, M)
        return jnp.pad(s, ((0, 0),) * 3 + ((0, pad),)) if pad else s

    return tuple(fin(s) for s in sums)


# ---------------------------------------------------------------------------
# Top level: dispatch, merge, per-view aggregation
# ---------------------------------------------------------------------------


def consistency_moves(
    ctx,
    cache,
    d_c,  # (M, V, Mh, Mw) candidate plane disparities (any M)
    n_c,  # (M, V, Mh, Mw, 3) candidate plane normals
    state_d,  # (V, Mh, Mw) the FROZEN input state (window anchor)
    state_n,  # (V, Mh, Mw, 3)
    *,
    gamma, alpha, fuse, bl_ratio,
    pairs: tuple,
    interpret: bool = False,
    lane_backend: str = "pallas",
):
    """Consistency scores for ALL candidate moves of one sweep at once.

    Equivalent to stacking ``refine.consistency_from_cache`` over the move
    axis (same pair list, same per-view subset-order aggregation), with
    h/v pairs resolved through the strip kernel and the rest through the
    exact XLA path.  Moves beyond the kernel's 32 lane slots are chunked
    (each chunk re-stages its strips — configs with steps > 6 just pay
    another pass).  Returns ((M, V, Mh, Mw) scores, escape_overflow).
    """
    m = d_c.shape[0]
    if m > _MOVE_SLOTS:
        outs, esc = [], jnp.int32(0)
        for lo in range(0, m, _MOVE_SLOTS):
            cs_i, esc_i = _consistency_moves_32(
                ctx, cache, d_c[lo : lo + _MOVE_SLOTS],
                n_c[lo : lo + _MOVE_SLOTS], state_d, state_n,
                gamma=gamma, alpha=alpha, fuse=fuse, bl_ratio=bl_ratio,
                pairs=pairs, interpret=interpret, lane_backend=lane_backend,
            )
            outs.append(cs_i)
            esc = esc + esc_i
        return jnp.concatenate(outs, axis=0), esc
    return _consistency_moves_32(
        ctx, cache, d_c, n_c, state_d, state_n,
        gamma=gamma, alpha=alpha, fuse=fuse, bl_ratio=bl_ratio,
        pairs=pairs, interpret=interpret, lane_backend=lane_backend,
    )


def _consistency_moves_32(
    ctx, cache, d_c, n_c, state_d, state_n, *,
    gamma, alpha, fuse, bl_ratio, pairs: tuple, interpret: bool = False,
    lane_backend: str = "pallas",
):
    v, mh, mw = state_d.shape
    m = d_c.shape[0]
    assert m <= _MOVE_SLOTS, m
    h_img, w_img = ctx.labels.shape[1:3]
    center = ctx.center
    out_shape = (m,) + state_d.shape
    if len(pairs) == 0:
        return jnp.full(out_shape, _MARGIN, jnp.float32), jnp.int32(0)

    h_idx, v_idx, rest_idx = classify_pairs(pairs)

    # move-independent sample positions (same layout as the XLA path)
    cx = center[..., 0][:, :, None, :]  # (V, Mh, 1, Mw)
    cy = center[..., 1][:, :, None, :]
    sx = cx.astype(jnp.int32) + ctx.samples[..., 0]  # (V, Mh, 9, Mw)
    sy = cy.astype(jnp.int32) + ctx.samples[..., 1]

    # shared candidate-plane disparity at every sample, move lanes minor
    pad_m = _MOVE_SLOTS - m
    mv = lambda a: jnp.moveaxis(a, 0, -1)  # (V, Mh, Mw, M)
    d32 = jnp.pad(mv(d_c), ((0, 0),) * 3 + ((0, pad_m),))
    n32 = jnp.pad(
        jnp.moveaxis(n_c, 0, -1), ((0, 0),) * 3 + ((0, 0), (0, pad_m))
    )  # (V, Mh, Mw, 3, 32)
    nx = n32[:, :, None, :, 0, :]  # (V, Mh, 1, Mw, 32)
    ny = n32[:, :, None, :, 1, :]
    nz = n32[:, :, None, :, 2, :]
    sxf = sx.astype(jnp.float32)[..., None]
    syf = sy.astype(jnp.float32)[..., None]
    dip_all = (
        nx * (cx[..., None] - sxf) + ny * (cy[..., None] - syf)
        + nz * d32[:, :, None, :, :]
    ) / nz  # (V, Mh, 9, Mw, 32)

    sums = [None] * len(pairs)
    esc_total = jnp.int32(0)
    if h_idx or v_idx:
        finite_all = jnp.isfinite(dip_all)
        # frozen-state plane disparity at each sample: the window anchor
        n0 = state_n
        dip0 = (
            n0[:, :, None, :, 0] * (cx - sxf[..., 0])
            + n0[:, :, None, :, 1] * (cy - syf[..., 0])
            + n0[:, :, None, :, 2] * state_d[:, :, None, :]
        ) / n0[:, :, None, :, 2]  # (V, Mh, 9, Mw)
        safe_i32 = lambda x: jnp.where(
            jnp.isfinite(x), _cl_round(x), 0.0
        ).astype(jnp.int32)
        ras_flat = cache.ras
        if h_idx:
            table_h = ras_flat.reshape(v * h_img, 4 * w_img)
            cls = np.asarray(
                [[pairs[i][0], pairs[i][1], int(pairs[i][2])] for i in h_idx],
                np.int32,
            )
            s_h, esc = _class_sums(
                ras_flat, table_h, (h_img, w_img), False, cls, sx, sy,
                safe_i32(dip_all), safe_i32(dip0), dip_all, finite_all,
                ctx.color, m, gamma=gamma, alpha=alpha, fuse=fuse,
                interpret=interpret, lane_backend=lane_backend,
            )
            esc_total = esc_total + esc
            for k, i in enumerate(h_idx):
                sums[i] = tuple(s[k] for s in s_h)
        if v_idx:
            # transposed table: rows = image columns, strips along y
            table_v = (
                ras_flat.reshape(v, h_img, w_img, 4)
                .transpose(0, 2, 1, 3)
                .reshape(v * w_img, 4 * h_img)
            )
            cls = np.asarray(
                [[pairs[i][0], pairs[i][1], int(pairs[i][3])] for i in v_idx],
                np.int32,
            )
            s_v, esc = _class_sums(
                ras_flat, table_v, (h_img, w_img), True, cls, sx, sy,
                safe_i32(bl_ratio * dip_all), safe_i32(bl_ratio * dip0),
                dip_all, finite_all, ctx.color, m,
                gamma=gamma, alpha=alpha, fuse=fuse, interpret=interpret,
                lane_backend=lane_backend,
            )
            esc_total = esc_total + esc
            for k, i in enumerate(v_idx):
                sums[i] = tuple(s[k] for s in s_v)
    if rest_idx:
        s_r = _pair_sums_xla(
            cache.ras, (h_img, w_img), tuple(pairs[i] for i in rest_idx),
            sx, sy, dip_all, ctx.color, m,
            gamma=gamma, alpha=alpha, fuse=fuse, bl_ratio=bl_ratio,
        )
        for k, i in enumerate(rest_idx):
            sums[i] = tuple(s[k] for s in s_r)

    # per-pair contribution (exact formula order of the XLA path)
    import numpy as _np

    refs_np = _np.asarray([p[0] for p in pairs], _np.int32)
    bounds = _np.searchsorted(refs_np, _np.arange(v + 1))
    fl1 = ctx.fl[..., 1]  # (V, Mh, Mw)
    contribs, has = [], []
    for i, p in enumerate(pairs):
        num, visib_sum, visible, visibility, occl_sum = sums[i]
        c = jnp.where(
            visib_sum > 0,
            (visib_sum / jnp.maximum(num, 1.0))
            * (visibility / jnp.maximum(visib_sum, 1e-30))
            * (visible / jnp.maximum(visib_sum, 1e-30)),
            0.0,
        )
        c = c + jnp.where(occl_sum > 0, 0.5 * fl1[p[0]][..., None], 0.0)
        contribs.append(c)  # (Mh, Mw, 32)
        has.append((num > 0).astype(jnp.float32))

    cons_rows, cnt_rows = [], []
    zero = jnp.zeros((mh, mw, _MOVE_SLOTS), jnp.float32)
    for z in range(v):
        lo, hi = int(bounds[z]), int(bounds[z + 1])
        if lo == hi:
            cons_rows.append(zero)
            cnt_rows.append(zero)
            continue
        acc, cnt = contribs[lo], has[lo]
        for p_i in range(lo + 1, hi):
            acc = acc + contribs[p_i]
            cnt = cnt + has[p_i]
        cons_rows.append(acc)
        cnt_rows.append(cnt)
    consistency = jnp.stack(cons_rows)  # (V, Mh, Mw, 32)
    view_counter = jnp.stack(cnt_rows)
    cs = jnp.where(
        view_counter > 0,
        jnp.maximum(_MARGIN, consistency / jnp.maximum(view_counter, 1.0)),
        _MARGIN,
    )
    return jnp.moveaxis(cs, -1, 0)[:m], esc_total
