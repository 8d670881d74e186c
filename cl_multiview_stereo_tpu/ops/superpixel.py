"""Superpixel extent (radial footprint) computation.

Behavioral spec: kernel ``find_super_pixel_boundary``
(``clMVDE/clcode.cl:791-855``): from each superpixel's (border-clamped)
center, walk 8 compass rays up to ``spixl_size-1`` steps and record ``i-1``
for the *last* radius ``i`` whose pixel still carries this superpixel's
label.  The result (the reference's ``uchar8 spixl_rep``) is the adaptive
sample footprint used by depth init and the consistency terms.

TPU-first: the walk is a static unrolled loop of gathers over all
``(V, Mh, Mw)`` superpixels at once — radius and direction count are
compile-time constants, so XLA sees a fixed fusion of 8*(S-1) gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import DerivedGeometry

# Compass slot order nw, w, sw, n, s, ne, e, se as (dx, dy)
# (clcode.cl:826-851); shared with testing.mirror.EXTENT_DIRS.
_DIRS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def clamp_center(cx: jax.Array, cy: jax.Array, w: int, h: int, s: int):
    """Center clamp of clcode.cl:809-819 (keeps the walk in-view)."""
    cx = jnp.where(cx < s, s, cx)
    cx = jnp.where(cx + s > w, cx - s, cx)
    cy = jnp.where(cy < s, s, cy)
    cy = jnp.where(cy + s > h, cy - s, cy)
    return cx, cy


@partial(jax.jit, static_argnums=(2,))
def superpixel_extent(
    labels: jax.Array, centers: jax.Array, geom: DerivedGeometry
) -> jax.Array:
    """Compute the 8-direction extent for every superpixel.

    ``labels``: (V, H, W) int32 per-view flat labels;
    ``centers``: (V, Mh, Mw, 2) float32 (x, y).
    Returns (V, Mh, Mw, 8) int32.
    """
    v, h, w = labels.shape
    s = geom.spixl_size
    mw, mh = geom.map_w, geom.map_h

    cx = centers[..., 0].astype(jnp.int32)  # C cast truncates; centers >= 0
    cy = centers[..., 1].astype(jnp.int32)
    cx, cy = clamp_center(cx, cy, w, h, s)

    mxg = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)
    myg = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)
    own_id = (myg * mw + mxg)[None]  # (1, Mh, Mw)

    vidx = jnp.arange(v, dtype=jnp.int32)[:, None, None]
    ext = jnp.zeros((v, mh, mw, 8), jnp.int32)
    for i in range(1, s):
        for k, (dx, dy) in enumerate(_DIRS):
            px = cx + i * dx
            py = cy + i * dy
            inb = (px >= 0) & (py >= 0) & (px < w) & (py < h)
            lab_at = labels[vidx, jnp.clip(py, 0, h - 1), jnp.clip(px, 0, w - 1)]
            match = inb & (lab_at == own_id)
            ext = ext.at[..., k].set(jnp.where(match, i - 1, ext[..., k]))
    return ext


def extent_step(ext: jax.Array) -> jax.Array:
    """Adaptive sample-grid step from the extent bounding box
    (clcode.cl:997-1007): step = max(1, 0.25*(bb_near + bb_far)) per axis.

    ``ext``: (..., 8) int32.  Returns (..., 2) float32 (step_x, step_y).
    """
    e = ext.astype(jnp.float32)
    bb_l = jnp.maximum(e[..., 0], jnp.maximum(e[..., 1], e[..., 2]))
    bb_r = jnp.maximum(e[..., 5], jnp.maximum(e[..., 6], e[..., 7]))
    bb_t = jnp.maximum(e[..., 0], jnp.maximum(e[..., 3], e[..., 5]))
    bb_b = jnp.maximum(e[..., 2], jnp.maximum(e[..., 4], e[..., 7]))
    sx = jnp.maximum(1.0, 0.25 * (bb_l + bb_r))
    sy = jnp.maximum(1.0, 0.25 * (bb_t + bb_b))
    return jnp.stack([sx, sy], axis=-1)


# Sample index layout of the consistency terms (clcode.cl:1271-1305): the
# 3x3 grid position (i, j), i outer in -1..1 mapping to x, j inner mapping
# to y, reads extent slot (i+1)*3 + (j+1) from [s0,s1,s2,s3,0,s4,s5,s6,s7].
def consistency_samples(ext: jax.Array) -> jax.Array:
    """Per-superpixel 9-point sample offsets used by the consistency terms.

    Returns (..., 9, 2) int32 offsets (dx, dy) such that sample p is at
    ``center + offset`` — offset = (r*i, r*j) with r the slot radius.
    """
    e = ext
    zeros = jnp.zeros_like(e[..., 0])
    radii = jnp.stack(
        [e[..., 0], e[..., 1], e[..., 2], e[..., 3], zeros, e[..., 4], e[..., 5], e[..., 6], e[..., 7]],
        axis=-1,
    )  # (..., 9) in (i, j) row-major order
    ii = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)
    jj = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)
    return jnp.stack([radii * ii, radii * jj], axis=-1)
