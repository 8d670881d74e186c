"""Per-op timing of the SLIC stage at the reference scene (scan-chained,
memoization-proof): association vs update vs suppress.

Run: python -u tools/probe_slic.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cl_multiview_stereo_tpu.config import (
    DerivedGeometry, SlicParams, SystemSettings,
)
from cl_multiview_stereo_tpu.io.images import load_image_array
from cl_multiview_stereo_tpu.ops import slic
from cl_multiview_stereo_tpu.ops.color import rgb_to_lab


def scan_time(fn, label, *arrays, iters=4):
    # arrays must be jit ARGUMENTS: closed-over device arrays bake into the
    # compile request as constants and the axon tunnel 413s past ~300 MB
    @jax.jit
    def run(seed, *arrs):
        def body(carry, k):
            out = fn(carry + k, *arrs)
            return carry + jnp.mean(out).astype(jnp.float32), None

        c, _ = jax.lax.scan(
            body, seed, jnp.arange(iters, dtype=jnp.float32)
        )
        return c

    float(run(jnp.float32(0.0), *arrays))
    ts = []
    for s_ in (1.0, 2.0):
        t0 = time.perf_counter()
        float(run(jnp.float32(s_), *arrays))
        ts.append(time.perf_counter() - t0)
    print(f"{label:40s} {min(ts)/iters*1e3:8.1f} ms", flush=True)


def main() -> None:
    s = SystemSettings()
    rgb = load_image_array("/root/reference/clMVDE/data.txt", s.view_num)
    geom = DerivedGeometry.create(rgb.shape[2], rgb.shape[1], s)
    p = SlicParams.create(s)
    lab = rgb_to_lab(jnp.asarray(rgb))
    spmap0 = slic.init_cluster_centers(lab, geom)
    labels0 = slic.find_center_association(lab, spmap0, geom, p)
    jax.block_until_ready(labels0)

    scan_time(
        lambda k, lab_: slic.find_center_association(
            lab_ + k * 1e-6, spmap0, geom, p
        ),
        "find_center_association", lab,
    )
    scan_time(
        lambda k, lab_, labels_: slic.update_cluster_centers(
            lab_ + k * 1e-6, labels_, spmap0, geom
        ).center,
        "update_cluster_centers", lab, labels0,
    )
    scan_time(
        lambda k, lab_: slic.segment(
            lab_ + k * 1e-6, geom, p
        )[0].astype(jnp.float32),
        "segment (full)", lab,
    )


if __name__ == "__main__":
    main()
