"""Probe: can the MXU absorb the PCF tent accumulation?

The tent stage (~40 ms/frame across both cascade evals) is VPU-bound at
the dense-lane formulation's floor (tent_probe.py). One family was never
tried: the per-pixel BILINEAR FORM

    result = sum_i  wy_i^T  CMP  wx_i
           = einsum('nir,nri->n', WY, einsum('nrc,nic->nri', CMP, WX))

which moves the big contraction (over the 16 window columns) onto the
MXU as a batched (16r x 16c) @ (16c x 16i) matmul per pixel, leaving the
VPU only the tent builds (16 taps x 16 positions each — 8x fewer lanes
than the dense form's 16 taps x 128/256) and one 256-lane mul-reduce.

Risks probed: K=16 contractions run at ~1/8 MXU efficiency, and HIGHEST
(6-pass) f32 multiplies that — the round-3 kernel probe found a K=16
HIGHEST matmul 8x slower than VPU FMAs. Batched-tiny matmuls may also
lower as loops. Variants:

  V1  dense-lane reference formulation (inner/outer split, from the
      shipping poisson_pcf_windowed) — the baseline;
  V6  bilinear form, HIGHEST f32 (bit-comparable candidate);
  V6d bilinear form, default precision (NOT exact — ceiling only);
  V6b bilinear form, bf16 inputs (NOT exact — ceiling only);
  V7  x-projection on MXU only: per tap px = CMP @ wx_i (batched
      matvec), wy on VPU — middle ground.

Correctness: V6 must match V1 to ~1e-5 (all-16-taps-on-256-lanes form,
no inner/outer split, so both evaluate identical math).

RESULT (v5e, 2026-08-19, 40-row lax.map chunks for the bilinear forms —
unchunked they OOM on the ~2 GB (H,W,16,16) intermediates):

    V6 vs V1 max abs err: 1.19e-07   (bit-comparable: formulation exact)
    V1 dense lanes (all-16/256)    22.92 ms
    V6 bilinear MXU HIGHEST        97.61 ms
    V6d bilinear MXU default       72.71 ms
    V6b bilinear MXU bf16         109.52 ms

DEAD END, consistent with the round-3 kernel finding: a K=16 batched
contraction runs at ~1/8 MXU efficiency and HIGHEST multiplies passes;
even the non-exact default/bf16 ceilings lose 3-4x to the dense VPU
form. The dense-lane tent accumulation stays.

Run ON THE TPU: python -m experiments.tent_mxu_probe
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


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    H, W = 1080, 1920
    k1, k3, k4, k5 = jax.random.split(key, 4)
    cmp16 = (jax.random.uniform(k1, (H, W, 256)) > 0.5).astype(jnp.float32)
    fx = jax.random.uniform(k3, (H, W)) * 8.0 + 3.0
    fy = jax.random.uniform(k4, (H, W)) * 1.0 + 3.0
    theta = jax.random.uniform(k5, (H, W)) * 6.28

    m16 = np.arange(256)
    sy16 = jnp.asarray((m16 // 16).astype(np.float32))
    sx16 = jnp.asarray((m16 % 16).astype(np.float32))
    s16 = jnp.arange(16, dtype=jnp.float32)
    radius = 2.5

    def tap_xy_all(theta):
        c, sn = jnp.cos(theta), jnp.sin(theta)
        px = jnp.asarray(POISSON_DISK[:, 0])
        py = jnp.asarray(POISSON_DISK[:, 1])
        dx = (px * c[..., None] - py * sn[..., None]) * radius  # (..., 16)
        dy = (px * sn[..., None] + py * c[..., None]) * radius
        return dx, dy

    def v1(cmp16, fx, fy, theta):
        c, sn = jnp.cos(theta), jnp.sin(theta)
        Wacc = jnp.zeros(fx.shape + (256,), jnp.float32)
        for i in range(N_SAMPLE):
            pxd, pyd = POISSON_DISK[i]
            dx = (pxd * c - pyd * sn) * radius
            dy = (pxd * sn + pyd * c) * radius
            wx = jnp.maximum(1.0 - jnp.abs(sx16 - (fx + dx)[..., None]), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(sy16 - (fy + dy)[..., None]), 0.0)
            Wacc = Wacc + wy * wx
        return (cmp16 * Wacc).sum(-1) / 16.0

    def bilinear(cmp16, fx, fy, theta, precision, dtype):
        # chunk over row blocks: the (..., 16, 16) intermediates are ~2 GB
        # full-screen; 40-row chunks keep them ~90 MB.
        def chunk(args):
            cmp16, fx, fy, theta = args
            dx, dy = tap_xy_all(theta)                   # (..., 16)
            X = fx[..., None] + dx                       # (..., 16 taps)
            Y = fy[..., None] + dy
            WX = jnp.maximum(1.0 - jnp.abs(s16 - X[..., None]), 0.0)
            WY = jnp.maximum(1.0 - jnp.abs(s16 - Y[..., None]), 0.0)
            C = cmp16.reshape(cmp16.shape[:-1] + (16, 16))  # (..., r, c)
            if dtype is not None:
                WX = WX.astype(dtype)
                WY = WY.astype(dtype)
                C = C.astype(dtype)
            G = jnp.einsum('hwrc,hwic->hwri', C, WX,
                           precision=precision,
                           preferred_element_type=jnp.float32)
            return (G * jnp.swapaxes(WY, -1, -2).astype(G.dtype)).sum(
                (-1, -2)) / 16.0

        H = fx.shape[0]
        CH = 40 if H % 40 == 0 else (8 if H % 8 == 0 else H)
        rs = lambda a: a.reshape((H // CH, CH) + a.shape[1:])
        out = jax.lax.map(chunk, (rs(cmp16), rs(fx), rs(fy), rs(theta)))
        return out.reshape(fx.shape)

    def v6(cmp16, fx, fy, theta):
        return bilinear(cmp16, fx, fy, theta, jax.lax.Precision.HIGHEST,
                        None)

    def v6d(cmp16, fx, fy, theta):
        return bilinear(cmp16, fx, fy, theta, jax.lax.Precision.DEFAULT,
                        None)

    def v6b(cmp16, fx, fy, theta):
        return bilinear(cmp16, fx, fy, theta, jax.lax.Precision.DEFAULT,
                        jnp.bfloat16)

    def v7(cmp16, fx, fy, theta):
        dx, dy = tap_xy_all(theta)
        X = fx[..., None] + dx
        Y = fy[..., None] + dy
        WX = jnp.maximum(1.0 - jnp.abs(s16 - X[..., None]), 0.0)
        C = cmp16.reshape(cmp16.shape[:-1] + (16, 16))
        G = jnp.einsum('hwrc,hwic->hwir', C, WX,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (...,i,r)
        WY = jnp.maximum(1.0 - jnp.abs(s16 - Y[..., None]), 0.0)
        return (G * WY).sum((-1, -2)) / 16.0

    # correctness first (tiny slice, on-device math)
    sl = (slice(0, 64), slice(0, 128))
    a = np.asarray(jax.jit(v1)(cmp16[sl], fx[sl], fy[sl], theta[sl]))
    b = np.asarray(jax.jit(v6)(cmp16[sl], fx[sl], fy[sl], theta[sl]))
    err = float(np.abs(a - b).max())
    print(f"V6 vs V1 max abs err: {err:.2e}", flush=True)

    for name, fn in [("V1 dense lanes (all-16/256)", v1),
                     ("V6 bilinear MXU HIGHEST    ", v6),
                     ("V6d bilinear MXU default   ", v6d),
                     ("V6b bilinear MXU bf16      ", v6b),
                     ("V7 x-proj MXU + wy VPU     ", v7)]:
        t = amortized(fn, cmp16, fx, fy, theta)
        print(f"{name}  {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
