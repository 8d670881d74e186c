"""Plane-sweep photo-consistency depth initialization.

Behavioral spec: kernel ``initial_depth_estimation_v2``
(``clMVDE/clcode.cl:972-1069``), the live depth-init core: per superpixel,
a 5x5 adaptive sample grid (pitch from the extent bounding box) is swept
over the disparity ladder; for each hypothesis d and each neighbor view the
cost is the SAD of Lab colors between the reference sample and its
projection ``(x - d*dvx, y - bl_ratio*d*dvy)`` (clcode.cl:1033-1034), with
an out-of-frame penalty of 30 per sample (clcode.cl:1037-1042); the
per-hypothesis cost is the *min* over neighbor views (clcode.cl:1054-1055)
and the winner-take-all disparity is written to the superpixel record
(clcode.cl:1059-1067).

TPU-first design:
  * all views are processed in one jitted call instead of the reference's
    per-view host loop (photo_consistency.cpp:133-140);
  * the cost volume lives in ``(V, D, Mh, Mw)`` layout so the 128-lane axis
    is the wide superpixel-column axis, not the 31-deep hypothesis axis
    (a trailing-D layout pads 31 -> 128, a 4x HBM blowup);
  * accumulation runs as ``lax.scan`` over neighbor slots and sample points
    (8 x 25 steps), keeping only O(V*D*Mh*Mw) live temporaries instead of
    an unrolled graph of hundreds;
  * images are gathered channel-planar ``(3, V, H, W)`` so gather outputs
    keep a wide trailing axis;
  * ties (equal costs) resolve to the lowest disparity index, identical to
    the reference's strict-``<`` ascending scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.ops.superpixel import extent_step

_OOB_PENALTY = 30.0
_BIG = 1.0e6

_SAMPLE_OFFSETS = tuple((i, j) for i in range(-2, 3) for j in range(-2, 3))


@partial(jax.jit, static_argnums=(5, 6))
def superpixel_cost_volume(
    lab: jax.Array,  # (V, H, W, 3)
    centers: jax.Array,  # (V, Mh, Mw, 2)
    step: jax.Array,  # (V, Mh, Mw, 2) adaptive sample pitch
    disp_levels: jax.Array,  # (D,) float32
    view_subset: jax.Array,  # (V, max_n) int32, -1 padded
    array_width: int,
    bl_ratio: float,
) -> jax.Array:
    """Build the per-superpixel cost volume, min-reduced over neighbor views.

    Returns (V, D, Mh, Mw) float32 costs (lower = better); views with an
    empty neighbor subset hold ``_BIG``.
    """
    v, h, w = lab.shape[:3]
    mh, mw = centers.shape[1:3]
    d = disp_levels.shape[0]
    max_n = view_subset.shape[1]

    labp = jnp.moveaxis(lab, -1, 0)  # (3, V, H, W) channel-planar

    z = jnp.arange(v, dtype=jnp.int32)
    cam_x = z % array_width
    cam_y = z // array_width

    valid_n = view_subset >= 0  # (V, max_n)
    view_ids_c = jnp.clip(view_subset, 0, v - 1)
    dvx_all = ((view_ids_c % array_width) - cam_x[:, None]).astype(jnp.float32)
    dvy_all = ((view_ids_c // array_width) - cam_y[:, None]).astype(jnp.float32)

    dl = disp_levels.astype(jnp.float32)  # (D,)
    cxf = centers[..., 0]  # (V, Mh, Mw)
    cyf = centers[..., 1]
    sample_ij = jnp.asarray(_SAMPLE_OFFSETS, jnp.float32)  # (25, 2)

    vid = jnp.arange(v, dtype=jnp.int32)[:, None, None]  # (V,1,1)

    def slot_body(vol, n):
        view_n = view_ids_c[:, n]  # (V,)
        # per-hypothesis projection shifts, (V, D)
        shift_x = dl[None, :] * dvx_all[:, n][:, None]
        shift_y = bl_ratio * dl[None, :] * dvy_all[:, n][:, None]

        def sample_body(acc, ij):
            i, j = ij[0], ij[1]
            xr = (cxf + i * step[..., 0]).astype(jnp.int32)  # C trunc cast
            yr = (cyf + j * step[..., 1]).astype(jnp.int32)
            ref_inb = (xr >= 0) & (yr >= 0) & (xr < w) & (yr < h)
            xrc = jnp.clip(xr, 0, w - 1)
            yrc = jnp.clip(yr, 0, h - 1)
            c_ref = labp[:, vid, yrc, xrc]  # (3, V, Mh, Mw)

            xp = (
                xr[:, None].astype(jnp.float32) - shift_x[:, :, None, None]
            ).astype(jnp.int32)  # (V, D, Mh, Mw)
            yp = (
                yr[:, None].astype(jnp.float32) - shift_y[:, :, None, None]
            ).astype(jnp.int32)
            proj_inb = (xp >= 0) & (yp >= 0) & (xp < w) & (yp < h)
            xpc = jnp.clip(xp, 0, w - 1)
            ypc = jnp.clip(yp, 0, h - 1)
            view_b = view_n[:, None, None, None]
            c_proj = labp[:, view_b, ypc, xpc]  # (3, V, D, Mh, Mw)

            sad = jnp.sum(jnp.abs(c_ref[:, :, None] - c_proj), axis=0)
            ok = ref_inb[:, None] & proj_inb
            return acc + jnp.where(ok, sad, _OOB_PENALTY), None

        acc0 = jnp.zeros((v, d, mh, mw), jnp.float32)
        acc, _ = jax.lax.scan(sample_body, acc0, sample_ij)
        slot_valid = valid_n[:, n][:, None, None, None]
        return jnp.minimum(vol, jnp.where(slot_valid, acc, _BIG)), None

    vol0 = jnp.full((v, d, mh, mw), _BIG, jnp.float32)
    vol, _ = jax.lax.scan(slot_body, vol0, jnp.arange(max_n, dtype=jnp.int32))
    return vol


def wta_disparity(
    vol: jax.Array, disp_levels: jax.Array, subset_num: jax.Array
) -> jax.Array:
    """Winner-take-all over the hypothesis axis (clcode.cl:1059-1067).

    ``vol``: (V, D, Mh, Mw).  Strict-``<`` ascending scan == argmin with
    first-tie-wins.  Views with no neighbors keep the reference's
    never-updated 0.0 (clcode.cl:1014).
    """
    idx = jnp.argmin(vol, axis=1)
    disp = disp_levels[idx]
    has_views = subset_num > 0
    return jnp.where(has_views[:, None, None], disp, 0.0)


@partial(jax.jit, static_argnums=(6, 7))
def initial_depth_estimation(
    lab: jax.Array,
    centers: jax.Array,
    extent: jax.Array,
    disp_levels: jax.Array,
    view_subset: jax.Array,
    subset_num: jax.Array,
    array_width: int,
    bl_ratio: float,
) -> jax.Array:
    """Full depth init: extent -> adaptive step -> cost volume -> WTA.

    Returns (V, Mh, Mw) float32 initial disparity (the reference's
    ``spixl_map.s7``).
    """
    step = extent_step(extent)
    vol = superpixel_cost_volume(
        lab, centers, step, disp_levels, view_subset, array_width, bl_ratio
    )
    return wta_disparity(vol, disp_levels, subset_num)
