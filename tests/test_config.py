import numpy as np
import pytest

from cl_multiview_stereo_tpu.config import (
    RefinementSchedule,
    SlicParams,
    SystemSettings,
    build_disp_levels,
    build_view_subsets,
    camera_grid_coords,
    map_size_for,
)


def test_default_settings_match_reference_main():
    # clMVDE.cpp:14-36
    s = SystemSettings()
    assert s.spixl_size == 8
    assert s.view_num == 9
    assert s.bl_ratio == pytest.approx(1.03590)


def test_disp_levels_inclusive_bound():
    # pipeline.cpp:121-124: 30..60 step 1 -> 31 levels despite num_disp_levels=30
    s = SystemSettings()
    d = build_disp_levels(s)
    assert len(d) == 31
    assert d[0] == 30 and d[-1] == 60


def test_map_size_ceil():
    assert map_size_for(640, 480, 8) == (80, 60)
    assert map_size_for(641, 481, 8) == (81, 61)


def test_view_subsets_center_and_corner():
    s = SystemSettings()
    subset, counts = build_view_subsets(s)
    # 3x3 grid, radius 1: center view 4 has all 8 neighbors
    assert counts[4] == 8
    assert set(subset[4, :8].tolist()) == {0, 1, 2, 3, 5, 6, 7, 8}
    # corner view 0 has 3 neighbors
    assert counts[0] == 3
    assert set(subset[0, :3].tolist()) == {1, 3, 4}
    # enumeration order: x outer then y inner (pipeline.cpp:135-141)
    assert subset[4, :8].tolist() == [0, 3, 6, 1, 7, 2, 5, 8]


def test_refinement_schedule_transforms():
    # pipeline.cpp:164-166 + depth_refinement.cpp:330-339,767-769
    r = RefinementSchedule.create(SystemSettings())
    assert r.gamma_eff == pytest.approx(1.0 / 8.0)
    assert r.alpha_eff == pytest.approx(1.0 / 72.0)
    assert r.fuse_eff == pytest.approx(0.5)
    # (1080/2) // 13 * 8 = 41*8 = 328 with C++ integer division
    assert r.sp_kernel_step == 328.0
    assert r.steps_per_iter == (13, 6, 4, 3, 2)
    assert r.step_size_per_iter == (328.0, 164.0, 328.0 / 3, 82.0, 65.6)


def test_slic_params_normalizers():
    # clSLIC.cpp:15-18
    p = SlicParams.create(SystemSettings())
    assert p.max_xy_dist == pytest.approx((1.0 / (1.4242 * 8)) ** 2, rel=1e-6)
    assert p.max_color_dist == pytest.approx((15.0 / (1.7321 * 128)) ** 2, rel=1e-6)


def test_camera_grid_coords():
    c = camera_grid_coords(9, 3)
    assert c[4].tolist() == [1, 1]
    assert c[5].tolist() == [2, 1]
    assert c[6].tolist() == [0, 2]


def test_settings_roundtrip(tmp_path):
    s = SystemSettings(min_disp=10, max_disp=100)
    p = tmp_path / "cfg.json"
    import json

    p.write_text(json.dumps(s.to_dict()))
    s2 = SystemSettings.from_json(str(p))
    assert s2 == s
    with pytest.raises(ValueError):
        SystemSettings.from_dict({"bogus": 1})
