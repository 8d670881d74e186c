import numpy as np
import pytest

from cl_multiview_stereo_tpu.io.images import load_image_array
from cl_multiview_stereo_tpu.io.native_loader import (
    load_image_array_native,
    native_available,
)


@pytest.fixture()
def scene_list(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
        p = tmp_path / f"v{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    # one jpeg to exercise the jpeg path (lossy: compare loosely)
    lst = tmp_path / "data.txt"
    lst.write_text("\n".join(paths))
    return str(lst)


def test_native_matches_pil(scene_list):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    a = load_image_array(scene_list)
    b = load_image_array_native(scene_list)
    np.testing.assert_array_equal(a, b)


def test_native_error_on_missing(tmp_path):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    lst = tmp_path / "data.txt"
    lst.write_text("nope.png\n")
    with pytest.raises(IOError):
        load_image_array_native(str(lst))
