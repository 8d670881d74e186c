"""Probe: TPU gather-rate ladder over ROW WIDTH (scan-chained timing).

Motivation: the depth-init sweep can be restructured so one gathered row
carries a CONTIGUOUS strip covering all 31 hypotheses x 3 channels
(~101 floats) per (cell, sample, pair) — 58M wide rows instead of 226M
narrow ones — IF wide-row gathers don't collapse the row rate.  BASELINE
round-2 assumed ~65 M rows/s at 32 B; this measures 4 B .. 1 KB rows
with the memoization-proof harness (on-device lax.scan chaining + host
pull; see tools/profile_propagate.py).

Run: python -u tools/probe_gather_rates.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

N = 11_700_000
ROWS = 2_073_600


def scan_time(fn, *args, iters=8):
    @jax.jit
    def run(seed, *a):
        def body(carry, k):
            out = fn(*a, (carry * 0 + seed + k).astype(jnp.int32))
            return carry + out.ravel()[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32)
        )
        return c

    float(run(jnp.float32(0.0), *args))
    ts = []
    for s in (1.0, 2.0):
        t0 = time.perf_counter()
        float(run(jnp.float32(s), *args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    for n_rows, width in (
        (N, 1), (N, 4), (N, 8),
        (N // 4, 32), (N // 8, 64), (58_000_000 // 16, 104),
        (N // 16, 128), (N // 32, 256),
    ):
        tab = jax.random.normal(key, (ROWS, width), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (n_rows,), 0, ROWS, jnp.int32)

        def g(t, i, k):
            out = t[(i + k) % ROWS]
            return jnp.sum(out[:2], axis=-1)

        t = scan_time(g, tab, idx)
        gb = n_rows * width * 4 / t / 1e9
        print(
            f"width {width:4d} f32 ({width*4:5d} B): {n_rows/1e6:5.1f}M rows "
            f"{t*1e3:8.2f} ms {n_rows/t/1e6:7.0f} M rows/s {gb:7.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
