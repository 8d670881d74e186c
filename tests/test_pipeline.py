import os

import numpy as np
import pytest

from cl_multiview_stereo_tpu.config import SystemSettings
from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline
from cl_multiview_stereo_tpu.testing import synthetic


@pytest.fixture(scope="module")
def small_settings():
    return SystemSettings(
        array_width=2,
        array_height=2,
        spixl_size=8,
        min_disp=4,
        max_disp=11,
        inc=1,
        bl_ratio=1.0,
        kernel_size=8,
        kernel_step=2,
        no_prop=2,
    )


@pytest.fixture(scope="module")
def scene(small_settings):
    views, gt = synthetic.two_plane_scene(
        48, 64, array_width=2, array_height=2, disp_bg=5.0, disp_fg=9.0,
        bl_ratio=1.0, seed=11,
    )
    return views, gt


def test_pipeline_end_to_end(small_settings, scene):
    views, gt = scene
    pipe = MVSPipeline.create(64, 48, small_settings)
    art = pipe.run(views)
    d = np.asarray(art.disp_full)
    assert d.shape == (4, 48, 64)
    assert np.isfinite(d).all()
    # majority of pixels near one of the two true disparities
    near = (np.abs(d - 5.0) <= 1.5) | (np.abs(d - 9.0) <= 1.5)
    assert near.mean() > 0.55, f"near-GT fraction {near.mean()}"


def test_pipeline_cross_check(small_settings, scene):
    views, gt = scene
    pipe = MVSPipeline.create(64, 48, small_settings, cross_check=True)
    art = pipe.run(views)
    d = np.asarray(art.disp_full)
    assert np.isfinite(d).all()
    # the vote keeps the largest stable disparity; zeros mark rejected pixels
    assert (d != 0).mean() > 0.5


def test_pipeline_gather_method(small_settings, scene):
    views, _ = scene
    pipe = MVSPipeline.create(64, 48, small_settings, depth_method="gather")
    art = pipe.run(views)
    assert np.isfinite(np.asarray(art.disp_init)).all()


def test_artifact_checkpoint_roundtrip(tmp_path, small_settings, scene):
    from cl_multiview_stereo_tpu.utils import artifacts

    views, _ = scene
    pipe = MVSPipeline.create(64, 48, small_settings)
    art = pipe.run(views)
    p = str(tmp_path / "ckpt.npz")
    artifacts.save_checkpoint(p, disp=art.disp_full, labels=art.labels)
    loaded = artifacts.load_checkpoint(p)
    np.testing.assert_array_equal(loaded["disp"], np.asarray(art.disp_full))
    np.testing.assert_array_equal(loaded["labels"], np.asarray(art.labels))

    artifacts.dump_stage_pngs(str(tmp_path), "disp_init", art.disp_init, 4, 11)
    out = tmp_path / artifacts.STAGE_DIRS["disp_init"]
    assert len(list(out.glob("*.png"))) == 4
