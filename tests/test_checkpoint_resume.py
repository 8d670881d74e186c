"""Checkpoint RESUME: re-entering the pipeline from a saved stage matches
the straight-through run (VERDICT r3 item 9 — save/load existed but nothing
resumed).  The reference has no checkpointing at all; its de-facto resume
was re-running from the per-stage PNG tree (SURVEY.md section 4)."""

import numpy as np
import pytest

from cl_multiview_stereo_tpu.config import SystemSettings
from cl_multiview_stereo_tpu.models.mvs_pipeline import MVSPipeline
from cl_multiview_stereo_tpu.testing import synthetic
from cl_multiview_stereo_tpu.utils import artifacts


@pytest.fixture(scope="module")
def small_settings():
    return SystemSettings(
        array_width=2, array_height=2, spixl_size=8,
        min_disp=4, max_disp=11, inc=1, bl_ratio=1.0,
        kernel_size=8, kernel_step=2, no_prop=2,
    )


@pytest.fixture(scope="module")
def straight(small_settings):
    views, _ = synthetic.two_plane_scene(
        48, 64, array_width=2, array_height=2, disp_bg=5.0, disp_fg=9.0,
        bl_ratio=1.0, seed=11,
    )
    pipe = MVSPipeline.create(64, 48, small_settings)
    return views, pipe, pipe.run(views)


def _save(art, path, **extra):
    artifacts.save_checkpoint(
        path,
        labels=art.labels,
        center=art.spmap.center,
        color=art.spmap.color,
        count=art.spmap.count,
        **extra,
    )


def test_resume_from_post_slic(tmp_path, straight):
    views, pipe, art = straight
    p = str(tmp_path / "slic.npz")
    _save(art, p)
    art2 = pipe.resume(views, p)
    np.testing.assert_array_equal(np.asarray(art2.labels), np.asarray(art.labels))
    np.testing.assert_array_equal(
        np.asarray(art2.disp_init), np.asarray(art.disp_init)
    )
    np.testing.assert_array_equal(
        np.asarray(art2.disp_full), np.asarray(art.disp_full)
    )


def test_resume_from_depth_init(tmp_path, straight):
    views, pipe, art = straight
    p = str(tmp_path / "depth.npz")
    _save(art, p, disp_init=art.disp_init)
    art2 = pipe.resume(views, p)
    np.testing.assert_array_equal(
        np.asarray(art2.state.d), np.asarray(art.state.d)
    )
    np.testing.assert_array_equal(
        np.asarray(art2.disp_full), np.asarray(art.disp_full)
    )


def test_resume_from_refined_state(tmp_path, straight):
    views, pipe, art = straight
    p = str(tmp_path / "state.npz")
    _save(
        art, p, disp_init=art.disp_init,
        state_d=art.state.d, state_sm=art.state.sm,
        state_cs=art.state.cs, state_n=art.state.n,
    )
    art2 = pipe.resume(views, p)
    np.testing.assert_array_equal(
        np.asarray(art2.disp_full), np.asarray(art.disp_full)
    )
