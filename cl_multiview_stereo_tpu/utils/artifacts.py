"""Stage artifact dumps and checkpoint/resume.

The reference's de-facto checkpoints were per-stage grayscale PNGs in a
numbered ``results/`` tree (SURVEY.md section 4).  We keep that as an
opt-in debug mode and add real array checkpoints (compressed npz) so any
stage can be re-entered without recomputation.
"""

from __future__ import annotations

import os

import numpy as np


# Stage directory names mirror the reference's results/ tree.
STAGE_DIRS = {
    "disp_init": "1- initialize disparity",
    "flatness": "2- flatness",
    "init_sm": "3- initialize smoothness",
    "init_cs": "4- initialize consistency",
    "sm": "5- smoothness",
    "cs": "6- consistency",
    "propagate": "7- propagate",
    "fusion": "8- Fusion",
}


def dump_stage_pngs(out_dir: str, name: str, arr, lo: float, hi: float) -> None:
    """Write one grayscale PNG per view for a (V, ...) array."""
    from cl_multiview_stereo_tpu.io.images import save_gray_png

    sub = os.path.join(out_dir, STAGE_DIRS.get(name, name))
    a = np.asarray(arr)
    for v in range(a.shape[0]):
        save_gray_png(os.path.join(sub, f"{name}_{v}.png"), a[v], lo, hi)


def save_checkpoint(path: str, **arrays) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_checkpoint(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
