"""Pure-numpy scalar mirrors of the reference OpenCL kernels.

Each function here re-derives, in plain Python loops, the math of one live
device kernel from ``clMVDE/clcode.cl`` (citations inline).  They are the
behavioral spec the vectorized jnp/Pallas ops are differential-tested
against — the same host-mirror-vs-device pattern the reference used
(``photo_consistency.cpp:212-236``, ``depth_refinement.cpp:197-228,405-451``),
made deterministic and pytest-friendly.

Array layout conventions (the framework's, not the reference's):
  * images: ``(V, H, W, C)`` numpy arrays;
  * superpixel grids: ``(V, Mh, Mw, C)``;
  * labels: per-view flat superpixel index ``row * Mw + col`` in ``(V, H, W)``.

C semantics mirrored exactly: int casts truncate toward zero, ``round()`` is
half-away-from-zero (OpenCL round), loop iteration order matters for
first-strict-minimum winners.
"""

from __future__ import annotations

import math

import numpy as np


def c_int(x: float) -> int:
    """C-style (int) cast: truncate toward zero."""
    return int(np.trunc(x))


def cl_round(x: float) -> float:
    """OpenCL round(): half away from zero."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


# ---------------------------------------------------------------------------
# Color: rgb2lab (clcode.cl:21-59)
# ---------------------------------------------------------------------------


def rgb2lab_pixel(r: float, g: float, b: float) -> tuple[float, float, float]:
    """Scalar mirror of device ``rgb2lab`` (clcode.cl:21-59). r,g,b in 0..255."""
    _r, _g, _b = r * 0.0039216, g * 0.0039216, b * 0.0039216
    x = _r * 0.412453 + _g * 0.357580 + _b * 0.180423
    y = _r * 0.212671 + _g * 0.715160 + _b * 0.072169
    z = _r * 0.019334 + _g * 0.119193 + _b * 0.950227
    eps, kappa = 0.008856, 903.3
    xr, yr, zr = x / 0.950456, y / 1.0, z / 1.088754

    def f(t: float) -> float:
        return t ** (1.0 / 3.0) if t > eps else (kappa * t + 16.0) / 116.0

    fx, fy, fz = f(xr), f(yr), f(zr)
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def rgb2lab(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) RGB -> Lab, elementwise mirror of kernel ``cvt`` (clcode.cl:125-151)."""
    out = np.zeros(rgb.shape[:-1] + (3,), dtype=np.float64)
    flat_in = rgb.reshape(-1, 3)
    flat_out = out.reshape(-1, 3)
    for i in range(flat_in.shape[0]):
        r, g, b = float(flat_in[i, 0]), float(flat_in[i, 1]), float(flat_in[i, 2])
        flat_out[i] = rgb2lab_pixel(r, g, b)
    return out


# ---------------------------------------------------------------------------
# SLIC: init_cluster_centers (clcode.cl:259-294)
# ---------------------------------------------------------------------------


def slic_init_centers(
    lab: np.ndarray, map_w: int, map_h: int, spixl_size: int
) -> dict[str, np.ndarray]:
    """Mirror of ``init_cluster_centers`` for one view.

    ``lab``: (H, W, 3).  Returns dict of center (Mh, Mw, 2) [x, y], color
    (Mh, Mw, 3), count (Mh, Mw).

    Border clamp quirk preserved: centers past the image edge are pulled to
    ``(col*S + img_size)/2`` using a ``>`` (not ``>=``) comparison
    (clcode.cl:273-277), which can still index one past the valid range for
    images whose size is an exact multiple of S — the reference relies on
    that never happening for its inputs; we clamp the final sample index
    (the only defined behavior available to us) while keeping the stored
    center coordinates identical.
    """
    h, w = lab.shape[:2]
    center = np.zeros((map_h, map_w, 2), dtype=np.float64)
    color = np.zeros((map_h, map_w, 3), dtype=np.float64)
    count = np.zeros((map_h, map_w), dtype=np.float64)
    for row in range(map_h):
        for col in range(map_w):
            cx = col * spixl_size + spixl_size // 2
            cy = row * spixl_size + spixl_size // 2
            if cx > w:
                cx = (col * spixl_size + w) // 2
            if cy > h:
                cy = (row * spixl_size + h) // 2
            center[row, col] = (cx, cy)
            color[row, col] = lab[min(cy, h - 1), min(cx, w - 1)]
    return {"center": center, "color": color, "count": count}


# ---------------------------------------------------------------------------
# SLIC: find_center_association (clcode.cl:447-520)
# ---------------------------------------------------------------------------


def slic_distance(
    pix: np.ndarray,
    px: int,
    py: int,
    c_center: np.ndarray,
    c_color: np.ndarray,
    weight: float,
    space_norm: float,
    color_norm: float,
) -> float:
    """Mirror of ``slic_distance_function`` (clcode.cl:422-438).

    Note the normalizer naming is swapped at the call site: the kernel passes
    ``max_xy_dist`` (spatial normalizer) and ``max_color_dist``; distance =
    sqrt(color_dist^2 * color_norm + weight * space_dist^2 * space_norm)
    where ``weight`` is ``slic_color_weight`` applied to the *spatial* term
    (clcode.cl:433 with clSLIC.cpp:282-284).
    """
    cd = float(np.sum((pix - c_color) ** 2))
    sd = (px - c_center[0]) ** 2 + (py - c_center[1]) ** 2
    return math.sqrt(cd * color_norm + weight * sd * space_norm)


def slic_assign(
    lab: np.ndarray,
    centers: dict[str, np.ndarray],
    spixl_size: int,
    weight: float,
    space_norm: float,
    color_norm: float,
) -> np.ndarray:
    """Mirror of ``find_center_association`` for one view (clcode.cl:447-520).

    Returns (H, W) int64 labels (per-view flat index ``row*Mw + col``).

    The live path uses the gSLICr half-cell-parity trick restricted to a 2x2
    candidate window — with the reference's quirk preserved: the loop
    variable derived from the x-parity (``deltaX``) offsets the *y* cluster
    coordinate and vice versa (clcode.cl:475-479).  Ties resolve to the
    first candidate in loop order (strict ``<``, clcode.cl:487).
    """
    h, w = lab.shape[:2]
    map_h, map_w = centers["center"].shape[:2]
    labels = np.zeros((h, w), dtype=np.int64)
    for row in range(h):
        for col in range(w):
            cx = col // spixl_size
            cy = row // spixl_size
            dx = (col + spixl_size // 2) // spixl_size - cx
            dy = (row + spixl_size // 2) // spixl_size - cy
            best = 1e18
            best_id = -1
            for i in range(-1 + dx, dx + 1):  # offsets the y coordinate
                for j in range(-1 + dy, dy + 1):  # offsets the x coordinate
                    qx = cx + j
                    qy = cy + i
                    if 0 <= qx < map_w and 0 <= qy < map_h:
                        d = slic_distance(
                            lab[row, col],
                            col,
                            row,
                            centers["center"][qy, qx],
                            centers["color"][qy, qx],
                            weight,
                            space_norm,
                            color_norm,
                        )
                        if d < best:
                            best = d
                            best_id = qy * map_w + qx
            labels[row, col] = best_id
    return labels


# ---------------------------------------------------------------------------
# SLIC: update_cluster_center + finalize_reduction_result (clcode.cl:533-773)
# ---------------------------------------------------------------------------


def slic_update(
    lab: np.ndarray,
    labels: np.ndarray,
    centers: dict[str, np.ndarray],
    spixl_size: int,
) -> dict[str, np.ndarray]:
    """Mirror of the two-stage cluster update for one view.

    The device restricts each cluster's member search to the 3S x 3S window
    starting at ``(group_x*S - S, group_y*S - S)`` (clcode.cl:558-566) before
    reducing; members outside that window are dropped even if labeled with
    the cluster.  ``finalize_reduction_result`` then averages, zeroing
    center/color/count when a cluster has no members in the window
    (clcode.cl:731-771).  Disparity (s7) is untouched.
    """
    h, w = lab.shape[:2]
    map_h, map_w = centers["center"].shape[:2]
    out_center = np.zeros_like(centers["center"])
    out_color = np.zeros_like(centers["color"])
    out_count = np.zeros(centers["center"].shape[:2], dtype=np.float64)
    for gy in range(map_h):
        for gx in range(map_w):
            spixel_idx = gy * map_w + gx
            px_start = gx * spixl_size - spixl_size
            py_start = gy * spixl_size - spixl_size
            s_xy = np.zeros(2)
            s_color = np.zeros(3)
            n = 0.0
            for oy in range(3 * spixl_size):
                for ox in range(3 * spixl_size):
                    px = px_start + ox
                    py = py_start + oy
                    if 0 <= px < w and 0 <= py < h and labels[py, px] == spixel_idx:
                        s_color += lab[py, px]
                        s_xy += (px, py)
                        n += 1.0
            if n != 0:
                out_center[gy, gx] = s_xy / n
                out_color[gy, gx] = s_color / n
                out_count[gy, gx] = n
    return {"center": out_center, "color": out_color, "count": out_count}


# ---------------------------------------------------------------------------
# SLIC: supress_local_lable connectivity vote (clcode.cl:676-711)
# ---------------------------------------------------------------------------


def slic_suppress_labels(labels: np.ndarray) -> np.ndarray:
    """Mirror of ``supress_local_lable`` for one view: if >= 16 of the 5x5
    neighborhood carry a different label, adopt the last-seen different label
    (row-major scan order, clcode.cl:697-708).  Borders (2 px) pass through.
    """
    h, w = labels.shape
    out = labels.copy()
    for y in range(h):
        for x in range(w):
            if x <= 1 or y <= 1 or x >= w - 2 or y >= h - 2:
                continue
            clable = labels[y, x]
            diff_count = 0
            diff_label = -1
            for j in range(-2, 3):
                for i in range(-2, 3):
                    nl = labels[y + j, x + i]
                    if nl != clable:
                        diff_label = nl
                        diff_count += 1
            if diff_count >= 16:
                out[y, x] = diff_label
    return out


# ---------------------------------------------------------------------------
# Superpixel extent: find_super_pixel_boundary (clcode.cl:791-855)
# ---------------------------------------------------------------------------

# Compass order of the 8 extent slots: nw, w, sw, n, s, ne, e, se
# (clcode.cl:826-851).
EXTENT_DIRS = np.array(
    [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
    dtype=np.int64,
)  # (dx, dy)


def boundary_clamped_center(cx: int, cy: int, w: int, h: int, s: int) -> tuple[int, int]:
    """Center clamp of clcode.cl:809-819."""
    if cx < s:
        cx += s - cx
    if cx + s > w:
        cx -= s
    if cy < s:
        cy += s - cy
    if cy + s > h:
        cy -= s
    return cx, cy


def superpixel_extent(
    labels: np.ndarray, centers_xy: np.ndarray, spixl_size: int
) -> np.ndarray:
    """Mirror of ``find_super_pixel_boundary`` for one view.

    ``labels``: (H, W) per-view flat labels; ``centers_xy``: (Mh, Mw, 2).
    Returns (Mh, Mw, 8) int64 extents.

    Semantics preserved: the walk records ``i-1`` for the *last* radius i at
    which the probed pixel still carries this superpixel's label (matches
    need not be contiguous, clcode.cl:826-851); reads happen at the clamped
    center so they stay in-view; the bound conditions apply to the
    *unclamped* step, and the stored value saturates at ``spixl_size-2``.
    """
    h, w = labels.shape
    map_h, map_w = centers_xy.shape[:2]
    out = np.zeros((map_h, map_w, 8), dtype=np.int64)
    for my in range(map_h):
        for mx in range(map_w):
            sp_idx = my * map_w + mx
            cx, cy = c_int(centers_xy[my, mx, 0]), c_int(centers_xy[my, mx, 1])
            cx, cy = boundary_clamped_center(cx, cy, w, h, spixl_size)
            for i in range(1, spixl_size):
                for k, (dx, dy) in enumerate(EXTENT_DIRS):
                    px, py = cx + i * dx, cy + i * dy
                    if 0 <= px < w and 0 <= py < h and labels[py, px] == sp_idx:
                        out[my, mx, k] = i - 1
    return out
