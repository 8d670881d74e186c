"""Differential tests for the fusion cross-check vote (the reference's
disabled-but-intended path, clcode.cl:1995-2101)."""

import numpy as np
import pytest

from cl_multiview_stereo_tpu.ops import fusion
from cl_multiview_stereo_tpu.testing import mirror


@pytest.fixture(scope="module")
def disp_maps():
    rng = np.random.default_rng(3)
    v, h, w = 4, 12, 16
    # piecewise-constant disparities with noise + some zeros (rejections)
    base = rng.choice([0.0, 4.0, 7.0], size=(v, 1, 1), p=[0.1, 0.5, 0.4])
    d = np.broadcast_to(base, (v, h, w)) + rng.integers(0, 3, (v, h, w))
    d = d.astype(np.float32)
    d[rng.random((v, h, w)) < 0.1] = 0.0
    return d


def test_project_to_reference_inv_matches_mirror(disp_maps):
    got = np.asarray(fusion.project_to_reference_inv(disp_maps, 2, 1.0359))
    want = mirror.project_to_reference_inv(disp_maps, 2, 1.0359)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_remove_view_inconsistency_matches_mirror(disp_maps):
    proj = mirror.project_to_reference_inv(disp_maps, 2, 1.0359).astype(np.float32)
    got = np.asarray(
        fusion.remove_view_inconsistency(proj, disp_maps, 2, 1.0359, 1.0)
    )
    want = mirror.remove_view_inconsistency(proj, disp_maps, 2, 1.0359, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
