"""Probe: the PCF tent accumulation (~42 ms/frame, the largest single
line item after the hot-row fix) — what is it bound by, and do cheaper
formulations exist?

Variants on real-shaped synthetic data ((H, W) pixels, one cascade eval:
13 inner taps on 128 lanes + 3 outer on 256):

  V1 current formulation (Wacc accumulate, then sum(cmp * Wacc));
  V1x2 V1 with 2x the taps — if time ~2x the stage is VPU-bound, if flat
     it is HBM-bound;
  V2 per-tap reassociation sum_i sum(cmp * wy_i * wx_i) (no Wacc tensor);
  V3 bf16 tents (accumulate in bf16, reduce in f32);
  V4 y-projection: per tap sum_y wy(y) * [sum_x cmp(y,x) * wx(x)] via
     (..., 8, 16) shaped ops;
  V5 all-16-taps-on-256-lanes (no inner/outer split — measures what the
     8-row extraction buys).

Run ON THE TPU: python -m experiments.tent_probe
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.ops.shadows import POISSON_DISK, N_SAMPLE


def amortized(fn, *args, n=20):
    g = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda s, l: s + jnp.sum(l.astype(jnp.float32)),
        fn(*a), jnp.float32(0)))
    _ = float(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / n * 1e3


INNER = [i for i in range(N_SAMPLE)
         if float(np.hypot(*POISSON_DISK[i])) < 1.2]
OUTER = [i for i in range(N_SAMPLE) if i not in INNER]


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    H, W = 1080, 1920
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    cmp8 = (jax.random.uniform(k1, (H, W, 128)) > 0.5).astype(jnp.float32)
    cmp16 = (jax.random.uniform(k2, (H, W, 256)) > 0.5).astype(jnp.float32)
    fx = jax.random.uniform(k3, (H, W)) * 8.0 + 3.0
    fy = jax.random.uniform(k4, (H, W)) * 1.0 + 3.0
    theta = jax.random.uniform(k5, (H, W)) * 6.28

    m8 = np.arange(128)
    sy8 = jnp.asarray((m8 // 16).astype(np.float32))
    sx8 = jnp.asarray((m8 % 16).astype(np.float32))
    m16 = np.arange(256)
    sy16 = jnp.asarray((m16 // 16).astype(np.float32))
    sx16 = jnp.asarray((m16 % 16).astype(np.float32))
    radius = 2.5

    def taps(theta):
        c, sn = jnp.cos(theta), jnp.sin(theta)

        def tap_xy(i):
            pxd, pyd = POISSON_DISK[i]
            return ((pxd * c - pyd * sn) * radius,
                    (pxd * sn + pyd * c) * radius)

        return tap_xy

    def v1(cmp8, cmp16, fx, fy, theta, inner=INNER, outer=OUTER):
        tap_xy = taps(theta)
        Wacc8 = jnp.zeros(fx.shape + (128,), jnp.float32)
        for i in inner:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx8 - (fx + dx)[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy8 - (fy + dy)[..., None]), 0.0)
            Wacc8 = Wacc8 + wy * wx
        Wacc16 = jnp.zeros(fx.shape + (256,), jnp.float32)
        for i in outer:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx16 - (fx + dx)[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy16 - (fy + dy)[..., None]), 0.0)
            Wacc16 = Wacc16 + wy * wx
        return ((cmp8 * Wacc8).sum(-1) + (cmp16 * Wacc16).sum(-1)) / 16.0

    t = amortized(v1, cmp8, cmp16, fx, fy, theta)
    print(f"V1 current                         {t:7.2f} ms", flush=True)

    def v1x2(cmp8, cmp16, fx, fy, theta):
        return (v1(cmp8, cmp16, fx, fy, theta)
                + v1(cmp8, cmp16, fx + 0.25, fy + 0.25, theta + 1.0))

    t = amortized(v1x2, cmp8, cmp16, fx, fy, theta)
    print(f"V1 x2 taps (bound test)            {t:7.2f} ms", flush=True)

    def v2(cmp8, cmp16, fx, fy, theta):
        tap_xy = taps(theta)
        acc = jnp.zeros(fx.shape, jnp.float32)
        for i in INNER:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx8 - (fx + dx)[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy8 - (fy + dy)[..., None]), 0.0)
            acc = acc + (cmp8 * (wy * wx)).sum(-1)
        for i in OUTER:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx16 - (fx + dx)[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy16 - (fy + dy)[..., None]), 0.0)
            acc = acc + (cmp16 * (wy * wx)).sum(-1)
        return acc / 16.0

    t = amortized(v2, cmp8, cmp16, fx, fy, theta)
    print(f"V2 per-tap reduce                  {t:7.2f} ms", flush=True)

    def v3(cmp8, cmp16, fx, fy, theta):
        tap_xy = taps(theta)
        b = jnp.bfloat16
        Wacc8 = jnp.zeros(fx.shape + (128,), b)
        fxb = fx.astype(b)
        fyb = fy.astype(b)
        sx8b = sx8.astype(b)
        sy8b = sy8.astype(b)
        sx16b = sx16.astype(b)
        sy16b = sy16.astype(b)
        for i in INNER:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx8b - (fxb + dx.astype(b))[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy8b - (fyb + dy.astype(b))[..., None]), 0.0)
            Wacc8 = Wacc8 + wy * wx
        Wacc16 = jnp.zeros(fx.shape + (256,), b)
        for i in OUTER:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx16b - (fxb + dx.astype(b))[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy16b - (fyb + dy.astype(b))[..., None]), 0.0)
            Wacc16 = Wacc16 + wy * wx
        return ((cmp8 * Wacc8.astype(jnp.float32)).sum(-1)
                + (cmp16 * Wacc16.astype(jnp.float32)).sum(-1)) / 16.0

    t = amortized(v3, cmp8, cmp16, fx, fy, theta)
    print(f"V3 bf16 tents                      {t:7.2f} ms", flush=True)

    def v4(cmp8, cmp16, fx, fy, theta):
        tap_xy = taps(theta)
        c8 = cmp8.reshape(H, W, 8, 16)
        c16 = cmp16.reshape(H, W, 16, 16)
        sx = jnp.arange(16, dtype=jnp.float32)
        sy_8 = jnp.arange(8, dtype=jnp.float32)
        sy_16 = jnp.arange(16, dtype=jnp.float32)
        acc = jnp.zeros(fx.shape, jnp.float32)
        for i in INNER:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx - (fx + dx)[..., None]), 0.0)
            px = (c8 * wx[..., None, :]).sum(-1)  # (H, W, 8)
            wy = jnp.maximum(1.0 - jnp.abs(sy_8 - (fy + dy)[..., None]), 0.0)
            acc = acc + (px * wy).sum(-1)
        for i in OUTER:
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx - (fx + dx)[..., None]), 0.0)
            px = (c16 * wx[..., None, :]).sum(-1)
            wy = jnp.maximum(1.0 - jnp.abs(sy_16 - (fy + dy)[..., None]), 0.0)
            acc = acc + (px * wy).sum(-1)
        return acc / 16.0

    t = amortized(v4, cmp8, cmp16, fx, fy, theta)
    print(f"V4 y-projection (8,16) ops         {t:7.2f} ms", flush=True)

    def v5(cmp16, fx, fy, theta):
        tap_xy = taps(theta)
        Wacc = jnp.zeros(fx.shape + (256,), jnp.float32)
        for i in range(N_SAMPLE):
            dx, dy = tap_xy(i)
            wx = jnp.maximum(1.0 - jnp.abs(sx16 - (fx + dx)[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy16 - (fy + dy)[..., None]), 0.0)
            Wacc = Wacc + wy * wx
        return (cmp16 * Wacc).sum(-1) / 16.0

    t = amortized(v5, cmp16, fx, fy, theta)
    print(f"V5 all-16 on 256 lanes             {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
