"""Bisect the strips-consistency TPU worker crash (round-4/5 ledger).

The full engine = staging gathers (XLA) + Mosaic lane-gather kernel
(_run_terms) + escape fixup (XLA).  The round-5 repro crashed with a
"kernel fault" hint, so split the program:

  python -u tools/probe_cons_bisect.py sanity   # tiny matmul (worker alive?)
  python -u tools/probe_cons_bisect.py pallas   # kernel ALONE, full-scale rows
  python -u tools/probe_cons_bisect.py pallas N # ... with N total rows
  python -u tools/probe_cons_bisect.py xla      # full engine, kernel swapped
                                                # for an XLA take_along_axis
                                                # equivalent (also a timing
                                                # candidate in its own right)

Each mode is one process (persistent-process isolation per BASELINE plan).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "sanity"

    if mode == "sanity":
        x = jnp.ones((256, 256), jnp.float32)
        t0 = time.time()
        print("sanity:", float(jnp.sum(x @ x)), f"{time.time()-t0:.1f}s",
              flush=True)
        return

    from cl_multiview_stereo_tpu.ops.pallas import consistency as C

    if mode == "pallas":
        # full-scale kernel rows: _PAIR_CHUNK * Mh * 9 * Mw at the
        # reference scene (135 x 240 map)
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3 * 135 * 9 * 240
        rows += (-rows) % C._ROW_TILE
        rng = np.random.default_rng(0)
        lo = jnp.asarray(rng.normal(0, 1, (rows, C._LANES)), jnp.float32)
        hi = jnp.asarray(rng.normal(0, 1, (rows, C._LANES)), jnp.float32)
        idx = jnp.asarray(
            rng.integers(-1, 2 * C._LANES, (rows, C._LANES)), jnp.int32
        )
        aux = jnp.asarray(rng.normal(0, 1, (rows, C._LANES)), jnp.float32)

        # NB: strip/idx/aux MUST be jit ARGUMENTS — closing over them bakes
        # them into the compile request as constants, and the axon tunnel's
        # remote_compile rejects large bodies (HTTP 413 at 256K rows; the
        # round-5 full-scale "hang" was this, not a Mosaic fault)
        @jax.jit
        def run(seed, lo, hi, idx, aux):
            def body(carry, k):
                out = C._run_terms(
                    lo, hi, idx, aux + carry + k, gamma=0.05, alpha=0.1,
                    fuse=2.0,
                )
                return carry + jnp.mean(out), None

            c, _ = jax.lax.scan(
                body, seed, jnp.arange(4, dtype=jnp.float32)
            )
            return c

        t0 = time.time()
        print("compile+run1:", float(run(jnp.float32(0.0), lo, hi, idx, aux)),
              f"{time.time()-t0:.1f}s", flush=True)
        ts = []
        for s_ in (1.0, 2.0):
            t0 = time.perf_counter()
            float(run(jnp.float32(s_), lo, hi, idx, aux))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / 4
        lk = rows * C._LANES / per
        print(f"pallas kernel rows={rows}: {per*1e3:.1f} ms/call "
              f"({lk/1e9:.2f} G lane-lookups/s)", flush=True)
        return

    if mode == "stripgather":
        # minimal repro candidate: the staging gather alone at exact scale —
        # (1, 128)-slice CLIP-mode gathers of 875K rows from a (V*H, 4W)
        # table (what _strip_gather issues per pair chunk)
        from cl_multiview_stereo_tpu.ops.pallas import consistency as CC

        rows = 3 * 135 * 9 * 240
        rng = np.random.default_rng(0)
        table = jnp.asarray(
            rng.normal(0, 1, (9 * 1080, 4 * 1920 + 4)), jnp.float32
        )
        row_id = jnp.asarray(rng.integers(0, 9 * 1080, (rows,)), jnp.int32)
        col = jnp.asarray(
            4 * rng.integers(0, 1920 - 32, (rows,)), jnp.int32
        )

        @jax.jit
        def run(seed, table, row_id, col):
            def body(carry, k):
                lo_, hi_, rot = CC._strip_gather(
                    table, row_id, jnp.clip(col + k.astype(jnp.int32), 0, None)
                )
                return carry + jnp.mean(lo_) + jnp.mean(hi_)                     + jnp.mean(rot.astype(jnp.float32)) * 0, None

            c, _ = jax.lax.scan(
                body, seed, jnp.arange(4, dtype=jnp.float32)
            )
            return c

        t0 = time.time()
        print("compile+run1:", float(run(jnp.float32(0.0), table, row_id, col)),
              f"{time.time()-t0:.1f}s", flush=True)
        ts = []
        for s_ in (1.0, 2.0):
            t0 = time.perf_counter()
            float(run(jnp.float32(s_), table, row_id, col))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / 4
        print(f"strip gather rows={rows}: {per*1e3:.1f} ms/call "
              f"({rows/per/1e6:.0f} M rows/s, "
              f"{rows*512/per/2**30:.1f} GiB/s)", flush=True)
        return

    if mode in ("nofix", "nofix-pallas"):
        # full engine WITHOUT the exact escape fixup (top_k + scatter-add):
        # if this runs at full scale, the fixup is the crashing piece
        C._DISABLE_ESC_FIXUP = True
        import importlib.util
        import os

        path = os.path.join(os.path.dirname(__file__), "probe_cons_strips.py")
        spec = importlib.util.spec_from_file_location("probe_cons_strips", path)
        pcs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pcs)
        sys.argv = [sys.argv[0]] + ([] if mode.endswith("pallas") else ["xla"])
        pcs.main()
        return


    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
