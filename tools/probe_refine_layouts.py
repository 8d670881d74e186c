"""Probe: layout experiment for the propagate scoring path.

Hypothesis (BASELINE round-2 notes + probe_vmem_gather): the fused
consistency/smoothness scoring runs ~2.7x below the isolated gather rate
because the hot intermediates carry tiny minor axes — samples (...,9) and
taps (...,T=8) pad to 128 lanes (14-16x wasted VPU/HBM) and force
relayouts around the gather.  Variant B moves those axes off-minor:
``(P, Mh, 9, Mw)`` / ``(V, Mh, T, Mw)`` with Mw=240 -> 256 lanes (1.07x).

Run standalone on the TPU: python -u tools/probe_refine_layouts.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

V, MH, MW = 9, 135, 240
H, W = 1080, 1920
T = 8  # taps at the reference config (all long-range moves degenerate)
_MARGIN = 0.01


def timeit(fn, *args, iters=12, perturb=0):
    """Scan-chained on-device timing: the axon tunnel memoizes identical
    executions (content-addressed, even across processes), so host-side
    repeat loops measure nothing.  Chain ``iters`` calls in one executable
    with a per-step input perturbation on argument ``perturb`` and a carry
    that consumes every step's output."""

    @jax.jit
    def run(seed, *a):
        def body(carry, k):
            aa = list(a)
            aa[perturb] = aa[perturb] + (carry * 0 + seed + k) * jnp.float32(1e-6)
            out = fn(*aa)
            return carry + jnp.mean(out), None
        c, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.float32)
        )
        return c

    float(run(jnp.float32(0.0), *args))  # compile; host-pull = real barrier
    ts = []
    for s in (1.0, 2.0):  # unique seed per call defeats whole-run memoization
        t0 = time.perf_counter()
        float(run(jnp.float32(s), *args))  # block_until_ready lies on axon
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def make_pairs(array_width=3):
    pairs = []
    for z in range(V):
        zx, zy = z % array_width, z // array_width
        for n in range(V):
            nx_, ny_ = n % array_width, n // array_width
            if n != z and abs(nx_ - zx) <= 1 and abs(ny_ - zy) <= 1:
                pairs.append((z, n, float(nx_ - zx), float(ny_ - zy)))
    return tuple(pairs)


def _cl_round(x):
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


# ---------------------------------------------------------------- variant A
# minor-axis samples, as shipped (refine.consistency_from_cache essentials)
def consistency_a(ras, center, samples, color, fl1, d0, n0, pairs,
                  *, gamma, alpha, fuse, bl_ratio):
    refs = np.asarray([p[0] for p in pairs], np.int32)
    nbrs = jnp.asarray([p[1] for p in pairs], jnp.int32)
    dvx = jnp.asarray([p[2] for p in pairs], jnp.float32)[:, None, None, None]
    dvy = jnp.asarray([p[3] for p in pairs], jnp.float32)[:, None, None, None]
    bounds = np.searchsorted(refs, np.arange(V + 1))
    refs_j = jnp.asarray(refs)
    take = lambda a: jnp.take(a, refs_j, axis=0)

    cx_i = center[..., 0].astype(jnp.int32)[..., None]
    cy_i = center[..., 1].astype(jnp.int32)[..., None]
    sx = cx_i + samples[..., 0]
    sy = cy_i + samples[..., 1]
    nx, ny, nz = n0[..., 0:1], n0[..., 1:2], n0[..., 2:3]
    d_intrp = (
        nx * (center[..., 0:1] - sx.astype(jnp.float32))
        + ny * (center[..., 1:2] - sy.astype(jnp.float32))
        + nz * d0[..., None]
    ) / nz
    sxp, syp, dip = take(sx), take(sy), take(d_intrp)
    xp = sxp - _cl_round(dip * dvx).astype(jnp.int32)
    yp = syp - _cl_round(bl_ratio * dip * dvy).astype(jnp.int32)
    inb = (xp >= 0) & (yp >= 0) & (xp < W) & (yp < H)
    viewb = nbrs[:, None, None, None]
    flat = viewb * (H * W) + jnp.clip(yp, 0, H - 1) * W + jnp.clip(xp, 0, W - 1)
    g = ras[flat.reshape(-1)].reshape(flat.shape + (4,))

    diff = g[..., 0] - dip
    when_visible = (jnp.abs(diff) < fuse).astype(jnp.float32)
    inbf = inb.astype(jnp.float32)
    visible = jnp.sum(inbf * when_visible * jnp.exp(-diff * diff * alpha), axis=-1)
    visib_sum = jnp.sum(inbf * when_visible, axis=-1)
    occl_sum = jnp.sum(inbf * (1.0 - when_visible), axis=-1)
    cdiff = jnp.sum((g[..., 1:4] - take(color)[..., None, :]) ** 2, axis=-1)
    visibility = jnp.sum(inbf * jnp.exp(-cdiff * gamma), axis=-1)
    num = jnp.sum(inbf, axis=-1)
    contrib = jnp.where(
        visib_sum > 0,
        (visib_sum / jnp.maximum(num, 1.0))
        * (visibility / jnp.maximum(visib_sum, 1e-30))
        * (visible / jnp.maximum(visib_sum, 1e-30)),
        0.0,
    )
    contrib = contrib + jnp.where(occl_sum > 0, 0.5 * take(fl1), 0.0)
    has = (num > 0).astype(jnp.float32)
    cons_rows, cnt_rows = [], []
    zero = jnp.zeros((MH, MW), jnp.float32)
    for z in range(V):
        lo, hi = int(bounds[z]), int(bounds[z + 1])
        if lo == hi:
            cons_rows.append(zero); cnt_rows.append(zero); continue
        acc, cnt = contrib[lo], has[lo]
        for p in range(lo + 1, hi):
            acc = acc + contrib[p]; cnt = cnt + has[p]
        cons_rows.append(acc); cnt_rows.append(cnt)
    consistency = jnp.stack(cons_rows)
    view_counter = jnp.stack(cnt_rows)
    return jnp.where(
        view_counter > 0,
        jnp.maximum(_MARGIN, consistency / jnp.maximum(view_counter, 1.0)),
        _MARGIN,
    )


# ---------------------------------------------------------------- variant B
# samples axis at position -2: heavy intermediates are (P, Mh, 9, Mw)
def consistency_b(ras, center, samples2, color, fl1, d0, n0, pairs,
                  *, gamma, alpha, fuse, bl_ratio):
    """samples2: (V, Mh, 9, Mw, 2) int32 (pre-transposed, once per scene)."""
    refs = np.asarray([p[0] for p in pairs], np.int32)
    nbrs = jnp.asarray([p[1] for p in pairs], jnp.int32)
    dvx = jnp.asarray([p[2] for p in pairs], jnp.float32)[:, None, None, None]
    dvy = jnp.asarray([p[3] for p in pairs], jnp.float32)[:, None, None, None]
    bounds = np.searchsorted(refs, np.arange(V + 1))
    refs_j = jnp.asarray(refs)
    take = lambda a: jnp.take(a, refs_j, axis=0)

    cx = center[..., 0][:, :, None, :]  # (V, Mh, 1, Mw)
    cy = center[..., 1][:, :, None, :]
    sx = cx.astype(jnp.int32) + samples2[..., 0]  # (V, Mh, 9, Mw)
    sy = cy.astype(jnp.int32) + samples2[..., 1]
    nx = n0[..., 0][:, :, None, :]
    ny = n0[..., 1][:, :, None, :]
    nz = n0[..., 2][:, :, None, :]
    d_intrp = (
        nx * (cx - sx.astype(jnp.float32))
        + ny * (cy - sy.astype(jnp.float32))
        + nz * d0[:, :, None, :]
    ) / nz
    sxp, syp, dip = take(sx), take(sy), take(d_intrp)
    xp = sxp - _cl_round(dip * dvx).astype(jnp.int32)
    yp = syp - _cl_round(bl_ratio * dip * dvy).astype(jnp.int32)
    inb = (xp >= 0) & (yp >= 0) & (xp < W) & (yp < H)
    viewb = nbrs[:, None, None, None]
    flat = viewb * (H * W) + jnp.clip(yp, 0, H - 1) * W + jnp.clip(xp, 0, W - 1)
    g = ras[flat.reshape(-1)].reshape(flat.shape + (4,))

    diff = g[..., 0] - dip
    when_visible = (jnp.abs(diff) < fuse).astype(jnp.float32)
    inbf = inb.astype(jnp.float32)
    visible = jnp.sum(inbf * when_visible * jnp.exp(-diff * diff * alpha), axis=2)
    visib_sum = jnp.sum(inbf * when_visible, axis=2)
    occl_sum = jnp.sum(inbf * (1.0 - when_visible), axis=2)
    colp = take(color)  # (P, Mh, Mw, 3)
    cdiff = sum(
        (g[..., 1 + c] - colp[..., c][:, :, None, :]) ** 2 for c in range(3)
    )
    visibility = jnp.sum(inbf * jnp.exp(-cdiff * gamma), axis=2)
    num = jnp.sum(inbf, axis=2)  # (P, Mh, Mw_on_lanes) -> (P, Mh, Mw)
    contrib = jnp.where(
        visib_sum > 0,
        (visib_sum / jnp.maximum(num, 1.0))
        * (visibility / jnp.maximum(visib_sum, 1e-30))
        * (visible / jnp.maximum(visib_sum, 1e-30)),
        0.0,
    )
    contrib = contrib + jnp.where(occl_sum > 0, 0.5 * take(fl1), 0.0)
    has = (num > 0).astype(jnp.float32)
    cons_rows, cnt_rows = [], []
    zero = jnp.zeros((MH, MW), jnp.float32)
    for z in range(V):
        lo, hi = int(bounds[z]), int(bounds[z + 1])
        if lo == hi:
            cons_rows.append(zero); cnt_rows.append(zero); continue
        acc, cnt = contrib[lo], has[lo]
        for p in range(lo + 1, hi):
            acc = acc + contrib[p]; cnt = cnt + has[p]
        cons_rows.append(acc); cnt_rows.append(cnt)
    consistency = jnp.stack(cons_rows)
    view_counter = jnp.stack(cnt_rows)
    return jnp.where(
        view_counter > 0,
        jnp.maximum(_MARGIN, consistency / jnp.maximum(view_counter, 1.0)),
        _MARGIN,
    )


# ------------------------------------------------------------- smoothness
def smooth_a(tap_ax, tap_ay, tap_d, tap_sim, wn, d0, n0, *, alpha):
    nx, ny, nz = n0[..., 0:1], n0[..., 1:2], n0[..., 2:3]
    d_intrp = (nx * tap_ax + ny * tap_ay + nz * d0[..., None]) / nz
    diff = d_intrp - tap_d
    sm = jnp.sum(tap_sim * jnp.exp(-diff * diff * alpha), axis=-1)
    return jnp.where(wn > 0, sm / wn, 1e-6)


def smooth_b(tap_ax, tap_ay, tap_d, tap_sim, wn, d0, n0, *, alpha):
    """taps at axis -2: (V, Mh, T, Mw)."""
    nx = n0[..., 0][:, :, None, :]
    ny = n0[..., 1][:, :, None, :]
    nz = n0[..., 2][:, :, None, :]
    d_intrp = (nx * tap_ax + ny * tap_ay + nz * d0[:, :, None, :]) / nz
    diff = d_intrp - tap_d
    sm = jnp.sum(tap_sim * jnp.exp(-diff * diff * alpha), axis=2)
    return jnp.where(wn > 0, sm / wn, 1e-6)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    pairs = make_pairs()
    print(f"pairs: {len(pairs)}", flush=True)

    ras = jnp.asarray(rng.normal(size=(V * H * W, 4)).astype(np.float32))
    gx = np.tile((np.arange(MW) * 8 + 4).astype(np.float32), (V, MH, 1))
    gy = np.tile((np.arange(MH)[:, None] * 8 + 4).astype(np.float32), (V, 1, MW))
    center = jnp.asarray(np.stack([gx, gy], -1) + rng.normal(size=(V, MH, MW, 2)) * 2)
    samples = jnp.asarray(rng.integers(-7, 8, size=(V, MH, MW, 9, 2)), jnp.int32)
    samples2 = jnp.moveaxis(samples, 3, 2)
    color = jnp.asarray(rng.normal(size=(V, MH, MW, 3)).astype(np.float32))
    fl1 = jnp.asarray(rng.uniform(size=(V, MH, MW)).astype(np.float32))
    d0 = jnp.asarray(rng.uniform(30, 60, size=(V, MH, MW)).astype(np.float32))
    n0 = np.concatenate(
        [rng.normal(size=(V, MH, MW, 2)) * 0.05, np.ones((V, MH, MW, 1))], -1
    )
    n0 = jnp.asarray((n0 / np.linalg.norm(n0, axis=-1, keepdims=True)).astype(np.float32))
    kw = dict(gamma=0.02, alpha=0.01, fuse=1.0, bl_ratio=1.0359)

    fa = jax.jit(lambda *a: consistency_a(*a, pairs=pairs, **kw))
    fb = jax.jit(lambda *a: consistency_b(*a, pairs=pairs, **kw))
    outa = np.asarray(jax.device_get(fa(ras, center, samples, color, fl1, d0, n0)))
    outb = np.asarray(jax.device_get(fb(ras, center, samples2, color, fl1, d0, n0)))
    ok = np.allclose(outa, outb, rtol=1e-6, atol=1e-6)
    ta = timeit(fa, ras, center, samples, color, fl1, d0, n0, perturb=5)
    tb = timeit(fb, ras, center, samples2, color, fl1, d0, n0, perturb=5)
    print(f"consistency A (samples minor): {ta*1e3:8.1f} ms", flush=True)
    print(f"consistency B (samples axis-2): {tb*1e3:8.1f} ms  match={ok}", flush=True)

    tap_shape_a = (V, MH, MW, T)
    tap_ax = rng.normal(size=tap_shape_a).astype(np.float32)
    tap_ay = rng.normal(size=tap_shape_a).astype(np.float32)
    tap_d = rng.uniform(30, 60, size=tap_shape_a).astype(np.float32)
    tap_sim = rng.uniform(size=tap_shape_a).astype(np.float32)
    wn = tap_sim.sum(-1)
    A = [jnp.asarray(x) for x in (tap_ax, tap_ay, tap_d, tap_sim)]
    B = [jnp.asarray(np.moveaxis(x, 3, 2)) for x in (tap_ax, tap_ay, tap_d, tap_sim)]
    wnj = jnp.asarray(wn)
    sa = jax.jit(lambda *a: smooth_a(*a, alpha=0.01))
    sb = jax.jit(lambda *a: smooth_b(*a, alpha=0.01))
    oa = np.asarray(jax.device_get(sa(*A, wnj, d0, n0)))
    ob = np.asarray(jax.device_get(sb(*B, wnj, d0, n0)))
    ok = np.allclose(oa, ob, rtol=1e-6, atol=1e-6)
    ta = timeit(sa, *A, wnj, d0, n0, iters=30, perturb=5)
    tb = timeit(sb, *B, wnj, d0, n0, iters=30, perturb=5)
    print(f"smoothness A (taps minor): {ta*1e3:8.2f} ms", flush=True)
    print(f"smoothness B (taps axis-2): {tb*1e3:8.2f} ms  match={ok}", flush=True)


if __name__ == "__main__":
    main()
