"""Pallas dense-sweep kernel vs the XLA reference model (interpret mode).

The kernel (ops/pallas/sweep.py) must reproduce ``plane_sweep_depth``
bitwise: identical projected-coordinate truncation (clcode.cl:1033-1047),
identical out-of-frame penalty windows, and the same box-sum association
order so WTA ties resolve identically.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import SystemSettings, build_view_subsets
from cl_multiview_stereo_tpu.models.plane_sweep import build_pairs, plane_sweep_depth
from cl_multiview_stereo_tpu.ops.pallas.sweep import plane_sweep_pallas


def _check(lab, ladder, pairs, bl_ratio, tile_h=16):
    d_ref, c_ref = plane_sweep_depth(lab, ladder, pairs, bl_ratio, 2)
    d_pal, c_pal = plane_sweep_pallas(
        lab, ladder, pairs, bl_ratio, tile_h=tile_h, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_pal))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pal))


@pytest.mark.parametrize(
    "dv", [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, 1)]
)
def test_single_pair_exact(dv):
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.uniform(0, 100, (2, 48, 160, 3)).astype(np.float32))
    ladder = tuple(float(d) for d in range(5, 13))
    _check(lab, ladder, ((0, 1, dv[0], dv[1]),), 1.03590)


def test_multiview_odd_shapes_exact():
    rng = np.random.default_rng(1)
    s = SystemSettings(
        array_width=3, array_height=3, min_disp=10, max_disp=20, inc=1
    )
    vs, sn = build_view_subsets(s)
    pairs = build_pairs(vs, sn, s.array_width)
    lab = jnp.asarray(rng.uniform(0, 100, (9, 53, 131, 3)).astype(np.float32))
    ladder = tuple(float(d) for d in range(10, 21))
    _check(lab, ladder, pairs, s.bl_ratio)
