import numpy as np
import pytest

from cl_multiview_stereo_tpu.config import DerivedGeometry, SlicParams, SystemSettings
from cl_multiview_stereo_tpu.ops import slic
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab
from cl_multiview_stereo_tpu.testing import mirror, synthetic


@pytest.fixture(scope="module")
def small_scene():
    s = SystemSettings(array_width=2, array_height=1, spixl_size=8)
    views, _ = synthetic.fronto_parallel_scene(
        40, 64, array_width=2, array_height=1, disp=6.0, seed=3
    )
    geom = DerivedGeometry.create(64, 40, s)
    lab = np.asarray(rgb_to_lab(views))
    return s, geom, lab


def test_init_centers_matches_mirror(small_scene):
    s, geom, lab = small_scene
    got = slic.init_cluster_centers(lab, geom)
    want = mirror.slic_init_centers(lab[0], geom.map_w, geom.map_h, s.spixl_size)
    np.testing.assert_allclose(np.asarray(got.center[0]), want["center"])
    np.testing.assert_allclose(np.asarray(got.color[0]), want["color"], rtol=1e-6)


def test_assignment_matches_mirror(small_scene):
    s, geom, lab = small_scene
    p = SlicParams.create(s)
    spmap = slic.init_cluster_centers(lab, geom)
    got = np.asarray(slic.find_center_association(lab, spmap, geom, p))
    centers0 = {
        "center": np.asarray(spmap.center[0]),
        "color": np.asarray(spmap.color[0]),
    }
    want = mirror.slic_assign(
        lab[0], centers0, s.spixl_size, p.color_weight, p.max_xy_dist, p.max_color_dist
    )
    agree = (got[0] == want).mean()
    assert agree > 0.995, f"label agreement {agree}"


def test_update_matches_mirror(small_scene):
    s, geom, lab = small_scene
    p = SlicParams.create(s)
    spmap = slic.init_cluster_centers(lab, geom)
    labels = slic.find_center_association(lab, spmap, geom, p)
    got = slic.update_cluster_centers(lab, labels, spmap, geom)
    centers0 = {
        "center": np.asarray(spmap.center[0]),
        "color": np.asarray(spmap.color[0]),
    }
    want = mirror.slic_update(lab[0], np.asarray(labels[0]), centers0, s.spixl_size)
    np.testing.assert_allclose(np.asarray(got.center[0]), want["center"], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.color[0]), want["color"], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.count[0]), want["count"])


def test_full_segmentation_properties(small_scene):
    s, geom, lab = small_scene
    p = SlicParams.create(s)
    labels, spmap = slic.segment(lab, geom, p)
    labels = np.asarray(labels)
    assert labels.shape == lab.shape[:3]
    assert labels.min() >= 0
    assert labels.max() < geom.map_w * geom.map_h
    # every pixel's label is within one cell of its home cell
    h, w = labels.shape[1:]
    col, row = np.meshgrid(np.arange(w), np.arange(h))
    gx, gy = labels[0] % geom.map_w, labels[0] // geom.map_w
    assert np.abs(gx - col // s.spixl_size).max() <= 1
    assert np.abs(gy - row // s.spixl_size).max() <= 1
    # counts sum to the number of pixels
    assert np.asarray(spmap.count).sum(axis=(1, 2))[0] == h * w


def test_edge_compute_matches_mirror(small_scene):
    s, geom, lab = small_scene
    got = np.asarray(slic.compute_edges(lab))
    want = mirror.edge_compute(lab[0])
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-4)


def test_edge_snap_matches_mirror(small_scene):
    s, geom, lab = small_scene
    spmap = slic.init_cluster_centers(lab, geom)
    edges = slic.compute_edges(lab)
    got = slic.apply_edge_snap(lab, edges, spmap)
    want_c, want_col = mirror.apply_edge(
        lab[0],
        np.asarray(edges[0]),
        np.asarray(spmap.center[0]),
        np.asarray(spmap.color[0]),
    )
    np.testing.assert_allclose(np.asarray(got.center[0]), want_c)
    np.testing.assert_allclose(np.asarray(got.color[0]), want_col, rtol=1e-6)
    # snapping must move at least some centers on a textured scene
    assert np.any(np.asarray(got.center[0]) != np.asarray(spmap.center[0]))


def test_segment_with_edge_enable_runs(small_scene):
    s, geom, lab = small_scene
    p = SlicParams.create(s.replace(edge_enable=True))
    labels, spmap = slic.segment(lab, geom, p)
    assert np.asarray(labels).shape == lab.shape[:3]
    assert np.asarray(spmap.count).sum(axis=(1, 2))[0] == lab.shape[1] * lab.shape[2]


def test_suppress_labels_matches_mirror(small_scene):
    s, geom, lab = small_scene
    p = SlicParams.create(s)
    labels, _ = slic.segment(lab, geom, p)
    # poke salt-and-pepper label noise to give the vote something to fix
    noisy = np.asarray(labels).copy()
    rng = np.random.default_rng(0)
    ys = rng.integers(2, noisy.shape[1] - 2, 30)
    xs = rng.integers(2, noisy.shape[2] - 2, 30)
    noisy[0, ys, xs] = 0
    got = np.asarray(slic.suppress_local_labels(noisy))
    want = mirror.slic_suppress_labels(noisy[0])
    np.testing.assert_array_equal(got[0], want)
