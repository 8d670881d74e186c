"""Pallas TPU kernel: dense plane-sweep cost volume + WTA.

The bandwidth-roofline kernel of the framework (BASELINE.md: cost-volume
kernel at >90% of per-chip roofline).  Computes, for one reference view,
``disp(y, x) = argmin_d min_pairs box5x5( SAD(ref, shift_d(view)) )`` — the
``initial_depth_estimation_v2`` photo-consistency math (clcode.cl:1033-1047)
applied densely per pixel.

Why a kernel: the XLA formulation (models/plane_sweep.py) materializes every
(pair, hypothesis) SAD plane and box sum through HBM (~35-100 GB/s
effective).  Here each row-tile loads the reference patch and, per pair, one
neighbor slab covering all hypothesis shifts into VMEM; the whole
D x pairs sweep then runs out of VMEM with a resident (D, tile, W) cost
volume, so HBM traffic is ~(1 + pairs) reads of the image rows per tile.

Layout: channel-planar ``(V, 3, Hp, Wp)`` float32, padded by ``pad_images``
so every in-kernel slice is in-bounds; out-of-frame samples get the
reference's 30-per-sample penalty (clcode.cl:1037) via exact per-hypothesis
projection-window masks.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PENALTY_PER_CH = 30.0
_BIG = 1.0e6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_int(c: float) -> int:
    """Integer shift with the reference's truncation folded in: any
    in-bounds trunc(x - c) == x - ceil(c) (the result is >= 0, where
    truncation == floor)."""
    return int(math.ceil(c))


def pad_images(lab: jax.Array, max_sx: int, max_sy: int, tile_h: int):
    """(V, H, W, 3) -> channel-planar padded (V, 3, Hp, Wp) with the
    geometry dict the kernel needs.

    The one-pixel ring just outside the image replicates the edge: the
    reference truncates the projected coordinate (clcode.cl:1034), so an
    in-window coordinate in (-1, 0) reads row/col 0.  Validity is decided
    by the in-kernel window masks, never by padding content."""
    v, h, w, _ = lab.shape
    halo = 2  # box radius
    # sublane alignment: DMA row offsets must be multiples of 8, so the
    # vertical margin is padded such that (my - 2) and the slab offset are
    # 8-aligned, with 8 spare bottom rows for the rounded-up DMA heights
    sy_pad = _round_up(max_sy, 8)
    my = sy_pad + 10
    mx = max_sx + halo
    h_tiles = -(-h // tile_h)
    h_pad = h_tiles * tile_h
    wp = _round_up(w + 2 * mx, 128)
    # slab DMA: rows [y0 + my - 2 - sy_pad, + slab_h); +16 covers the
    # aligned dynamic row window (base + tile_h + 16)
    slab_h = _round_up(tile_h + 16 + 2 * sy_pad, 8)
    # bottom margin must cover the LAST tile's slab end
    hp = max(h_pad + 2 * my, h_pad - tile_h + my - 2 - sy_pad + slab_h)
    planar = jnp.moveaxis(lab, -1, 1)  # (V, 3, H, W)
    padded = jnp.zeros((v, 3, hp, wp), jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, planar, (0, 0, my, mx))
    # edge-replicate ring at index -1 (top row, left col, corner)
    padded = jax.lax.dynamic_update_slice(
        padded, planar[:, :, :1, :], (0, 0, my - 1, mx)
    )
    padded = jax.lax.dynamic_update_slice(
        padded, planar[:, :, :, :1], (0, 0, my, mx - 1)
    )
    padded = jax.lax.dynamic_update_slice(
        padded, planar[:, :, :1, :1], (0, 0, my - 1, mx - 1)
    )
    geom = dict(
        v=v, h=h, w=w, my=my, mx=mx, h_pad=h_pad, wp=wp,
        tile_h=tile_h, n_tiles=h_tiles, sy_pad=sy_pad, slab_h=slab_h,
    )
    return padded, geom


def _sweep_kernel(
    meta_ref,  # SMEM prefetch (V, 1 + P): [n_pairs, view ids...]
    off_ref,  # SMEM prefetch (V, P, 4, D): slab offsets + window lows
    lab_ref,  # ANY (V, 3, Hp, Wp)
    disp_ref,  # VMEM out (tile_h, W)
    cost_ref,  # VMEM out (tile_h, W)
    ref_patch,  # VMEM scratch (3, tile_h + 8, Wp)
    slab,  # VMEM scratch (3, slab_h, Wp)
    costvol,  # VMEM scratch (D, tile_h, W)
    sem_ref,  # DMA sem
    sem_slab,  # DMA sem
    *,
    max_pairs: int,
    slab_h: int,
    sy_pad: int,
    ladder: tuple[float, ...],
    tile_h: int,
    w: int,
    h: int,
    my: int,
    mx: int,
):
    ref = pl.program_id(0)
    i = pl.program_id(1)
    d_num = len(ladder)
    y0 = i * tile_h

    # reference patch rows [y0 + my - 2, ...): 8-aligned offset, rounded-up
    # height (the extra rows are unused)
    cp = pltpu.make_async_copy(
        lab_ref.at[ref, :, pl.ds(y0 + my - 2, tile_h + 8), :],
        ref_patch,
        sem_ref,
    )
    cp.start()
    cp.wait()

    # image-row index of each sad row j (ref pixel row y0 + j - 2)
    yimg = y0 - 2 + jax.lax.broadcasted_iota(jnp.int32, (tile_h + 4, w), 0)
    ximg = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 4, w), 1)
    ref_valid = (yimg >= 0) & (yimg < h)

    costvol[...] = jnp.full_like(costvol, _BIG)

    n_pairs = meta_ref[ref, 0]
    for p in range(max_pairs):

        @pl.when(p < n_pairs)
        def _():
            view = meta_ref[ref, 1 + p]
            # slab rows [y0 + my - 2 - sy_pad, ...): 8-aligned offset
            cps = pltpu.make_async_copy(
                lab_ref.at[view, :, pl.ds(y0 + my - 2 - sy_pad, slab_h), :],
                slab,
                sem_slab,
            )
            cps.start()
            cps.wait()

            def d_body(di, _):
                ro = off_ref[ref, p, 0, di]
                co = off_ref[ref, p, 1, di]
                lo_y = off_ref[ref, p, 2, di]
                lo_x = off_ref[ref, p, 3, di]
                # sublane-aligned dynamic row slice + roll for the
                # remainder; lane shift via dynamic roll (the wrap margin
                # is horizontal padding, never read)
                base = pl.multiple_of((ro // 8) * 8, 8)
                rrem = ro - base
                wp = slab.shape[2]
                acc = jnp.zeros((tile_h + 4, w), jnp.float32)
                for c in range(3):
                    blk = slab[c, pl.ds(base, tile_h + 16), :]
                    blk = pltpu.roll(blk, tile_h + 16 - rrem, 0)
                    blk = pltpu.roll(blk, wp - co, 1)
                    win = blk[: tile_h + 4, :w]
                    acc = acc + jnp.abs(
                        ref_patch[c, : tile_h + 4, mx : mx + w] - win
                    )
                # exact projected-coordinate window (clcode.cl:1039):
                # valid iff lo <= coord <= size - 1 + shift, where the
                # shift is recovered from the slab offsets
                s_y = sy_pad - ro
                s_x = mx - co
                in_win = (
                    (yimg >= lo_y) & (yimg <= h - 1 + s_y)
                    & (ximg >= lo_x) & (ximg <= w - 1 + s_x)
                )
                # out-of-frame projection -> 30 penalty per sample
                # (clcode.cl:1037); rows outside the reference image
                # contribute 0 to the box sum (zero-padding semantics)
                sad = jnp.where(in_win, acc, _PENALTY_PER_CH)
                sad = jnp.where(ref_valid, sad, 0.0)
                # 5x5 box: rows (static slices), then cols (zero-padded)
                rowsum = (
                    sad[0:tile_h, :]
                    + sad[1 : tile_h + 1, :]
                    + sad[2 : tile_h + 2, :]
                    + sad[3 : tile_h + 3, :]
                    + sad[4 : tile_h + 4, :]
                )
                padded = jnp.pad(rowsum, ((0, 0), (2, 2)))
                box = (
                    padded[:, 0:w]
                    + padded[:, 1 : w + 1]
                    + padded[:, 2 : w + 2]
                    + padded[:, 3 : w + 3]
                    + padded[:, 4 : w + 4]
                )
                costvol[di] = jnp.minimum(costvol[di], box)
                return 0

            jax.lax.fori_loop(0, d_num, d_body, 0)

    # WTA with the reference's never-updated defaults (clcode.cl:1014):
    # a view with no pairs keeps disp 0 and cost 1e6
    best = jnp.full((tile_h, w), _BIG, jnp.float32)
    bestd = jnp.zeros((tile_h, w), jnp.float32)
    for di in range(d_num):
        take = costvol[di] < best
        best = jnp.where(take, costvol[di], best)
        bestd = jnp.where(take, jnp.float32(ladder[di]), bestd)
    disp_ref[0] = bestd
    cost_ref[0] = best


@partial(
    jax.jit,
    static_argnames=("ladder", "pairs", "bl_ratio", "tile_h", "interpret"),
)
def plane_sweep_pallas(
    lab: jax.Array,  # (V, H, W, 3) float32 Lab
    ladder: tuple[float, ...],
    pairs: tuple[tuple[int, int, int, int], ...],  # (ref, view, dvx, dvy)
    bl_ratio: float,
    tile_h: int = 16,
    interpret: bool = False,
):
    """Dense sweep for every reference view (one compiled kernel; the
    per-view pair lists ride in scalar-prefetch metadata).  Returns
    (disp (V, H, W), cost (V, H, W))."""
    v, h, w, _ = lab.shape
    shifts = [
        (_shift_int(d * dvx), _shift_int(bl_ratio * d * dvy))
        for (_, _, dvx, dvy) in pairs
        for d in ladder
    ]
    max_sx = max((abs(sft[0]) for sft in shifts), default=0)
    max_sy = max((abs(sft[1]) for sft in shifts), default=0)
    padded, g = pad_images(lab, max_sx, max_sy, tile_h)

    d_num = len(ladder)
    slab_h = g["slab_h"]

    per_ref = [[p for p in pairs if p[0] == ref] for ref in range(v)]
    max_pairs = max((len(rp) for rp in per_ref), default=1)
    meta = np.zeros((v, 1 + max_pairs), np.int32)
    # rows: 0 = slab row offset, 1 = slab col offset, 2/3 = first valid
    # image row/col of the projection window (floor of the float shift,
    # clcode.cl:1039 truncation semantics)
    off = np.zeros((v, max_pairs, 4, d_num), np.int32)
    for ref, rp in enumerate(per_ref):
        meta[ref, 0] = len(rp)
        for pi, (_, view, dvx, dvy) in enumerate(rp):
            meta[ref, 1 + pi] = view
            for di, d in enumerate(ladder):
                cy = bl_ratio * d * dvy
                cx = d * dvx
                off[ref, pi, 0, di] = g["sy_pad"] - _shift_int(cy)
                off[ref, pi, 1, di] = g["mx"] - _shift_int(cx)
                off[ref, pi, 2, di] = int(math.floor(cy))
                off[ref, pi, 3, di] = int(math.floor(cx))

    kern = partial(
        _sweep_kernel,
        max_pairs=max_pairs,
        slab_h=slab_h,
        sy_pad=g["sy_pad"],
        ladder=ladder,
        tile_h=tile_h,
        w=w,
        h=h,
        my=g["my"],
        mx=g["mx"],
    )
    disp, cost = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(v, g["n_tiles"]),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, tile_h, w), lambda r, i, *_: (r, i, 0)),
                pl.BlockSpec((1, tile_h, w), lambda r, i, *_: (r, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, tile_h + 8, g["wp"]), jnp.float32),
                pltpu.VMEM((3, slab_h, g["wp"]), jnp.float32),
                pltpu.VMEM((d_num, tile_h, w), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((v, g["h_pad"], w), jnp.float32),
            jax.ShapeDtypeStruct((v, g["h_pad"], w), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(meta), jnp.asarray(off), padded)
    return disp[:, :h, :], cost[:, :h, :]
