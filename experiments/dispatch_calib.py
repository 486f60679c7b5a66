"""Calibrate the probe harness: the single-dispatch round trip vs the
amortized cost of the frame's real gather shapes.

resolve_gather_probe's single-dispatch totals (~35 ms for a 2.1M-row
gather) are ambiguous: if the round trip is ~28 ms the gather itself is
~7 ms, which would contradict the ~31 ms in-frame attribution; if the
round trip is ~5 ms the gather is at its in-frame cost and there is no
headroom. This probe measures (a) an empty scalar jit round trip, and
(b) each gather shape AMORTIZED bench-style: N back-to-back dispatches,
read one scalar at the end, divide.

Run ON THE TPU: python -m experiments.dispatch_calib
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def amortized(fn, *args, n=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / n


def single(fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(np.asarray(out))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = float(np.asarray(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    H, W = 1080, 1920
    N = H * W
    T = 81920

    def empty(x):
        return x + 1.0

    x = jnp.zeros((), jnp.float32)
    print(f"empty jit: single {single(empty, x) * 1e3:7.3f} ms, "
          f"amortized {amortized(empty, x) * 1e3:7.3f} ms", flush=True)

    # record-shaped gather (2.1M rows, 21 MB table), smooth dup indices
    cell = 5
    cy = jnp.arange(H) // cell
    cx = jnp.arange(W) // cell
    ncx = (W + cell - 1) // cell
    cid = (cy[:, None] * ncx + cx[None, :]).reshape(-1)
    tid = (cid * 977) % T
    tbl = jax.random.normal(key, (T, 64), jnp.float32)

    def rec_gather(t, i):
        return t[i].sum()

    s = single(rec_gather, tbl, tid)
    a = amortized(rec_gather, tbl, tid)
    print(f"record gather 2.1M rows/21MB: single {s * 1e3:7.3f} ms, "
          f"amortized {a * 1e3:7.3f} ms ({a / N * 1e9:5.2f} ns/row)",
          flush=True)

    # PCF-shaped gather (4.1M rows, 2 x 67 MB)
    nb = 256
    yy = (jnp.arange(H, dtype=jnp.float32) / H * (nb - 2)).astype(jnp.int32)
    xx = (jnp.arange(W, dtype=jnp.float32) / W * (nb - 2)).astype(jnp.int32)
    qy = jnp.broadcast_to(yy[:, None], (H, W)).reshape(-1)
    qx = jnp.broadcast_to(xx[None, :], (H, W)).reshape(-1)
    r = jnp.hypot(qy.astype(jnp.float32) - nb / 2,
                  qx.astype(jnp.float32) - nb / 2)
    c = jnp.clip((r / (nb / 2) * 4).astype(jnp.int32), 0, 3)
    tblE = jax.random.randint(key, (2 * nb * nb, 128), 0, 2**31 - 1,
                              jnp.int32).astype(jnp.uint32)
    tblO = tblE + 1

    def pcf(tE, tO, c, qy, qx):
        ce = jnp.where(c % 2 == 0, c, jnp.minimum(c + 1, 2))
        co = jnp.where(c % 2 == 1, c, jnp.minimum(c + 1, 3))
        iE = ((ce >> 1) * nb + qy) * nb + qx
        iO = ((co >> 1) * nb + qy) * nb + qx
        return (tE[iE].sum(dtype=jnp.uint32)
                + tO[iO].sum(dtype=jnp.uint32)).astype(jnp.float32)

    s = single(pcf, tblE, tblO, c, qy, qx)
    a = amortized(pcf, tblE, tblO, c, qy, qx)
    print(f"pcf gathers 4.1M rows/2x67MB: single {s * 1e3:7.3f} ms, "
          f"amortized {a * 1e3:7.3f} ms ({a / (2 * N) * 1e9:5.2f} ns/row)",
          flush=True)

    # SSAO-shaped (7.3M rows, 8 MB quad table)
    th, tw = 540, 960
    M = th * tw
    quad = jax.random.normal(key, (M, 4), jnp.float32)
    keys = jax.random.split(key, 14)
    base = jnp.arange(M)
    idxs = [(base + jax.random.randint(keys[i], (M,), -3000, 3000)) % M
            for i in range(14)]

    def ssao(t, *idx):
        acc = 0.0
        for i in idx:
            acc = acc + t[i][:, 0].sum()
        return acc

    s = single(ssao, quad, *idxs)
    a = amortized(ssao, quad, *idxs)
    print(f"ssao gathers 7.3M rows/8MB: single {s * 1e3:7.3f} ms, "
          f"amortized {a * 1e3:7.3f} ms ({a / (14 * M) * 1e9:5.2f} ns/row)",
          flush=True)

    # overlap test: record + pcf + ssao fused in ONE jit, all independent.
    # If XLA overlaps independent gathers, fused << sum of parts.
    def fused(tbl, tid, tE, tO, c, qy, qx, quad, *idx):
        return (rec_gather(tbl, tid) + pcf(tE, tO, c, qy, qx)
                + ssao(quad, *idx))

    s = single(fused, tbl, tid, tblE, tblO, c, qy, qx, quad, *idxs)
    a = amortized(fused, tbl, tid, tblE, tblO, c, qy, qx, quad, *idxs)
    print(f"all three fused (13.5M rows): single {s * 1e3:7.3f} ms, "
          f"amortized {a * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
