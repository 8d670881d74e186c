"""Point-cloud export, numeric-health checks, distributed-mesh helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_ply_roundtrip(tmp_path):
    from cl_multiview_stereo_tpu.io.pointcloud import load_ply, save_ply

    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 256, size=(100, 3), dtype=np.uint8)
    p = str(tmp_path / "cloud.ply")
    save_ply(p, pts, cols)
    got_p, got_c = load_ply(p)
    np.testing.assert_array_equal(got_p, pts)
    np.testing.assert_array_equal(got_c, cols)


def test_disparity_to_points_drops_rejected():
    from cl_multiview_stereo_tpu.io.pointcloud import disparity_to_points

    disp = np.full((2, 4, 6), 5.0, np.float32)
    disp[0, 0, :] = 0.0  # fusion-vote rejected pixels
    rgb = np.zeros((2, 4, 6, 3), np.uint8)
    pts, cols = disparity_to_points(disp, rgb, array_width=2, bl_ratio=1.0)
    assert pts.shape[0] == 2 * 4 * 6 - 6
    assert np.allclose(pts[:, 2], 1.0 / 5.0)
    # view 1 sits one baseline to the right: X shifted by -d*cam_x
    view1 = pts[pts.shape[0] - 24 :]
    assert view1[:, 0].min() == -5.0


def test_draw_segmentation_lines():
    from cl_multiview_stereo_tpu.io.images import draw_segmentation_lines

    rgb = np.full((6, 8, 3), 7, np.uint8)
    labels = np.zeros((6, 8), np.int64)
    labels[:, 4:] = 1  # vertical boundary between cols 3 and 4
    out = draw_segmentation_lines(rgb, labels)
    # interior pixels adjacent to the label change turn red
    assert (out[1:-1, 3] == (255, 0, 0)).all()
    assert (out[1:-1, 4] == (255, 0, 0)).all()
    # pixels away from the boundary and the 1-px border pass through
    assert (out[1:-1, 1] == 7).all()
    assert (out[0] == 7).all() and (out[:, 0] == 7).all()
    # batched form
    out_b = draw_segmentation_lines(rgb[None], labels[None])
    np.testing.assert_array_equal(out_b[0], out)


def test_validate_stage_catches_nan():
    from cl_multiview_stereo_tpu.utils.debug import validate_stage

    validate_stage("ok", {"a": np.ones(3)})
    with pytest.raises(FloatingPointError, match="non-finite"):
        validate_stage("bad", {"a": np.asarray([1.0, np.nan])})
    with pytest.raises(FloatingPointError, match="all-zero"):
        validate_stage("zero", np.zeros(4), allow_zero=False)


def test_checked_wrapper_raises_on_nan():
    from cl_multiview_stereo_tpu.utils.debug import checked

    def f(x):
        return jnp.log(x)  # NaN for negative input

    g = checked(jax.jit(f))
    np.testing.assert_allclose(g(jnp.asarray([1.0])), [0.0])
    with pytest.raises(Exception, match="nan"):
        g(jnp.asarray([-1.0]))


def test_host_view_mesh_single_process():
    from cl_multiview_stereo_tpu.parallel.distributed import (
        initialize_distributed,
        make_host_view_mesh,
    )

    initialize_distributed()  # no-op single process
    mesh = make_host_view_mesh()
    assert mesh.axis_names == ("host", "view")
    assert mesh.shape["host"] == 1
    assert mesh.shape["view"] == len(jax.devices())
