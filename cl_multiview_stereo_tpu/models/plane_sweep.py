"""Dense per-pixel plane-sweep stereo over the camera-array model.

This is the ``initial_depth_estimation_v2`` cost math
(``clMVDE/clcode.cl:1017-1067``) applied densely at every pixel instead of
per superpixel: for each disparity hypothesis d, each neighbor view's image
is resampled at ``(x - d*dvx, y - bl_ratio*d*dvy)`` (clcode.cl:1033-1034),
the SAD over a box window is aggregated, the per-hypothesis cost is the min
over neighbor views, and WTA picks the disparity.

TPU-first: the disparity ladder is static, so every per-hypothesis shift is
a *compile-time* translation — implemented with pad+slice instead of
gathers.  The whole sweep is a fixed XLA fusion of shifts, absolute
differences and box-filter sums (separable cumulative-sum filter), with no
data-dependent indexing at all.  This is also the framework's roofline
benchmark kernel (BASELINE.md config 1/4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_OOB_PENALTY = 30.0
_BIG = 1.0e6


def _shift2d(img: jax.Array, sx: int, sy: int, fill: float) -> jax.Array:
    """out[y, x] = img[y - sy, x - sx] with ``fill`` outside — static shift
    via pad+slice (img: (..., H, W, C))."""
    h, w = img.shape[-3], img.shape[-2]
    py0, py1 = max(sy, 0), max(-sy, 0)
    px0, px1 = max(sx, 0), max(-sx, 0)
    pad = [(0, 0)] * (img.ndim - 3) + [(py0, py1), (px0, px1), (0, 0)]
    padded = jnp.pad(img, pad, constant_values=fill)
    return jax.lax.slice(
        padded,
        [0] * (img.ndim - 3) + [py1, px1, 0],
        list(img.shape[:-3]) + [py1 + h, px1 + w, img.shape[-1]],
    )


def _box_sum(x: jax.Array, radius: int) -> jax.Array:
    """Separable (2r+1)^2 box sum with zero padding (x: (..., H, W))."""
    if radius == 0:
        return x
    k = 2 * radius + 1

    # cumulative-sum sliding window along the last two axes
    def slide(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (radius + 1, radius)
        c = jnp.cumsum(jnp.pad(a, pad), axis=axis)
        hi = jax.lax.slice_in_dim(c, k, c.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, c.shape[axis] - k, axis=axis)
        return hi - lo

    return slide(slide(x, -1), -2)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def plane_sweep_depth(
    lab: jax.Array,  # (V, H, W, 3) Lab images
    disp_levels: tuple[float, ...],
    pairs: tuple[tuple[int, int, int, int], ...],  # (ref, view, dvx, dvy) static
    bl_ratio: float,
    window_radius: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Dense plane sweep for a static set of (reference, neighbor) pairs.

    Every pixel of every reference view gets a disparity.  ``pairs`` lists,
    per reference view, the neighbor views with their camera-grid deltas;
    the cost per hypothesis is min over that view's pairs.

    Returns (disp (V, H, W) float32, cost (V, H, W) float32 winning cost).
    """
    v, h, w = lab.shape[:3]
    d = len(disp_levels)

    best_cost = jnp.full((v, h, w), _BIG, jnp.float32)
    best_disp = jnp.zeros((v, h, w), jnp.float32)

    for disp in disp_levels:
        per_ref_min = jnp.full((v, h, w), _BIG, jnp.float32)
        for (ref, view, dvx, dvy) in pairs:
            # C cast semantics: the reference truncates the *projected
            # coordinate*, equivalent to truncating the shift toward zero
            # for integer pixel coords.
            shift_x = int(_trunc_shift(disp * dvx))
            shift_y = int(_trunc_shift(bl_ratio * disp * dvy))
            # want moved[y, x] = view[y - shift_y, x - shift_x]
            moved = _shift2d(lab[view], shift_x, shift_y, jnp.nan)
            sad = jnp.sum(jnp.abs(lab[ref] - moved), axis=-1)
            oob = jnp.isnan(sad)
            sad = jnp.where(oob, _OOB_PENALTY, sad)
            agg = _box_sum(sad, window_radius)
            per_ref_min = per_ref_min.at[ref].min(agg)
        take = per_ref_min < best_cost
        best_cost = jnp.where(take, per_ref_min, best_cost)
        best_disp = jnp.where(take, jnp.float32(disp), best_disp)
    return best_disp, best_cost


def _trunc_shift(x: float) -> int:
    """Truncate-toward-zero, matching the reference's (int) casts."""
    import math

    return int(math.trunc(x))


def build_pairs(
    view_subset, subset_num, array_width: int
) -> tuple[tuple[int, int, int, int], ...]:
    """Static pair list from the config's view-subset tables."""
    pairs = []
    v = view_subset.shape[0]
    for z in range(v):
        for n in range(int(subset_num[z])):
            view = int(view_subset[z, n])
            dvx = view % array_width - z % array_width
            dvy = view // array_width - z // array_width
            pairs.append((z, view, dvx, dvy))
    return tuple(pairs)
