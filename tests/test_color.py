import numpy as np

from cl_multiview_stereo_tpu.ops.color import rgb_to_lab
from cl_multiview_stereo_tpu.testing import mirror


def test_rgb_to_lab_matches_scalar_mirror():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    got = np.asarray(rgb_to_lab(rgb))
    want = mirror.rgb2lab(rgb)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_rgb_to_lab_white_and_black():
    lab = np.asarray(rgb_to_lab(np.array([[[255, 255, 255]], [[0, 0, 0]]], dtype=np.uint8)))
    assert 99.0 < lab[0, 0, 0] < 100.1
    assert abs(lab[1, 0, 0]) < 1e-3
    np.testing.assert_allclose(lab[:, :, 1:], 0.0, atol=0.05)


def test_rgb_to_lab_batch_shapes():
    rgb = np.zeros((2, 3, 5, 3), dtype=np.uint8)
    assert rgb_to_lab(rgb).shape == (2, 3, 5, 3)
