"""Probe: Mosaic `tpu.dynamic_gather` shapes/rates (in-VMEM data-dependent
lookups inside Pallas kernels).

Constraint discovered in jax 0.9.0 lowering (_gather_lowering_rule):
`jnp.take_along_axis(x, idx, axis)` lowers to `tpu.dynamic_gather` iff
x/idx/out all have the SAME 2D shape, axis is 0 (sublanes) or 1 (lanes).

The propagate stage is bound by the HBM gather engine (~70-90 M rows/s
fused, BASELINE.md).  If dynamic_gather resolves lookups at >>100 M/s, the
consistency scoring moves into a Pallas kernel and the pipeline stops being
gather-bound.

Run standalone on the TPU:  python tools/probe_vmem_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=50):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def probe(name, build, check=None):
    try:
        fn, args, n_lookups = build()
        out = jax.block_until_ready(fn(*args))
        ok = ""
        if check is not None:
            ok = "  [values OK]" if check(np.asarray(out), *map(np.asarray, args)) else "  [VALUES WRONG]"
        dt = timeit(fn, *args)
        rate = n_lookups / dt / 1e6
        print(f"  OK   {name:46s} {dt*1e3:8.3f} ms {rate:10.0f} M/s{ok}")
        return rate
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:100]
        print(f"  FAIL {name:46s} {msg}")
        return None


def make_sameshape(rows, cols, axis, reps, dtype=jnp.float32):
    """take_along_axis with idx shape == operand shape (per grid step)."""
    key = jax.random.PRNGKey(0)
    op = jax.random.normal(key, (reps * rows, cols)).astype(dtype)
    hi = rows if axis == 0 else cols
    idx = jax.random.randint(jax.random.PRNGKey(1), (reps * rows, cols), 0, hi, jnp.int32)

    def kernel(op_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(op_ref[:], idx_ref[:], axis=axis)

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((reps * rows, cols), dtype),
        grid=(reps,),
        in_specs=[
            pl.BlockSpec((rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ))
    return f, (op, idx), reps * rows * cols


def check_lane(out, op, idx):
    rows = out.shape[0]
    want = np.take_along_axis(op[:rows], idx[:rows], axis=1)
    return np.array_equal(out[:rows], want)


def check_sub(out, op, idx, block_rows):
    # gather happens per grid block of `block_rows` rows
    want = np.concatenate([
        np.take_along_axis(op[i:i + block_rows], idx[i:i + block_rows], axis=0)
        for i in range(0, op.shape[0], block_rows)
    ])
    return np.array_equal(out, want)


# composite: lookup table[yi, xi] per element, table (Q, 128), out (R, 128)
def make_2d(q, r, cols, reps):
    key = jax.random.PRNGKey(0)
    slab = jax.random.normal(key, (reps, q, cols), jnp.float32)
    yi = jax.random.randint(jax.random.PRNGKey(1), (reps, r, cols), 0, q, jnp.int32)
    xi = jax.random.randint(jax.random.PRNGKey(2), (reps, r, cols), 0, cols, jnp.int32)

    def kernel(slab_ref, yi_ref, xi_ref, out_ref):
        slab = slab_ref[0]
        # stage A: rows per (out_row, lane): row_vals[i, j] = slab[yi[i,j], j]
        # needs idx shape == slab shape -> process r rows of yi per pass,
        # padding idx to (q, cols)
        acc = jnp.zeros((r, cols), jnp.float32)
        n_pass = (r + q - 1) // q
        for p in range(n_pass):
            lo = p * q
            sz = min(q, r - lo)
            idx_blk = jnp.pad(yi_ref[0, lo:lo + sz, :], ((0, q - sz), (0, 0)))
            rows = jnp.take_along_axis(slab, idx_blk, axis=0)[:sz]
            vals = jnp.take_along_axis(rows, xi_ref[0, lo:lo + sz, :], axis=1)
            acc = jax.lax.dynamic_update_slice(acc, vals, (lo, 0))
        out_ref[0] = acc

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((reps, r, cols), jnp.float32),
        grid=(reps,),
        in_specs=[
            pl.BlockSpec((1, q, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ))
    return f, (slab, yi, xi), reps * r * cols


def check_2d(out, slab, yi, xi):
    want = np.stack([
        slab[k][yi[k], xi[k]] for k in range(slab.shape[0])
    ])
    return np.array_equal(out, want)


def main():
    print(f"devices: {jax.devices()}")
    print("\n-- lane gather (axis=1, idx shape == op shape) --")
    probe("lane 8x128", lambda: make_sameshape(8, 128, 1, 4096), check_lane)
    probe("lane 64x128", lambda: make_sameshape(64, 128, 1, 512), check_lane)
    probe("lane 512x128", lambda: make_sameshape(512, 128, 1, 64), check_lane)
    probe("lane 8x256", lambda: make_sameshape(8, 256, 1, 2048), check_lane)
    probe("lane 8x512", lambda: make_sameshape(8, 512, 1, 1024), check_lane)
    probe("lane 64x512", lambda: make_sameshape(64, 512, 1, 128), check_lane)
    probe("lane 64x1920", lambda: make_sameshape(64, 1920, 1, 32), check_lane)
    probe("lane 64x128 int32", lambda: make_sameshape(64, 128, 1, 512, jnp.int32), check_lane)

    print("\n-- sublane gather (axis=0, idx shape == op shape) --")
    probe("sub 8x128", lambda: make_sameshape(8, 128, 0, 4096),
          lambda o, op, i: check_sub(o, op, i, 8))
    probe("sub 64x128", lambda: make_sameshape(64, 128, 0, 512),
          lambda o, op, i: check_sub(o, op, i, 64))
    probe("sub 512x128", lambda: make_sameshape(512, 128, 0, 64),
          lambda o, op, i: check_sub(o, op, i, 512))
    probe("sub 64x512", lambda: make_sameshape(64, 512, 0, 128),
          lambda o, op, i: check_sub(o, op, i, 64))
    probe("sub 344x512", lambda: make_sameshape(344, 512, 0, 64),
          lambda o, op, i: check_sub(o, op, i, 344))

    print("\n-- composite 2D lookup slab[yi, xi] --")
    probe("2d q=64 r=64 c=128", lambda: make_2d(64, 64, 128, 512), check_2d)
    probe("2d q=128 r=64 c=128", lambda: make_2d(128, 64, 128, 256), check_2d)
    probe("2d q=344 r=64 c=512", lambda: make_2d(344, 64, 512, 64), check_2d)

    print("\n-- XLA HBM gather baseline --")
    def build_xla():
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (2_073_600, 4), jnp.float32)
        idx = jax.random.randint(key, (11_664_000,), 0, 2_073_600, jnp.int32)
        return jax.jit(lambda t, i: t[i]), (table, idx), 11_664_000
    probe("xla gather 11.7M rows of 4f", build_xla)


if __name__ == "__main__":
    main()
