"""Microbenchmark: gather primitives on the TPU.

The round-1 finding was "XLA gathers cost ~17 ns per ROW (any width)".
At 1080p parity defaults the frame issues ~24M gather rows, so gather
throughput bounds the frame at ~410 ms. This script searches for a faster
gather primitive before any kernel work.

Timing discipline (CLAUDE.md): the tunnel ignores block_until_ready, so
every timed computation reduces to ONE scalar inside the jit and we read
4 bytes. First call compiles; timed calls loop K times and take min.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(np.asarray(out))  # compile + sync
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = float(np.asarray(out))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, sec, rows):
    print(f"{name:55s} {sec * 1e3:9.3f} ms   {sec / rows * 1e9:7.2f} ns/row",
          flush=True)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    N = 1 << 22  # 4.19M gather rows per test

    # --- A: row width sweep, large table (64 MB, HBM resident) ---
    for width in (1, 4, 8, 16, 64, 128, 256):
        tbl_rows = (1 << 24) // max(width, 1)  # ~64MB f32
        tbl = jax.random.normal(key, (tbl_rows, width), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, tbl_rows, jnp.int32)
        if width == 1:
            tbl1 = tbl[:, 0]
            sec = timeit(lambda t, i: t[i].sum(), tbl1, idx)
        else:
            sec = timeit(lambda t, i: t[i].sum(), tbl, idx)
        report(f"A row gather w={width} table=64MB", sec, N)

    # --- B: table size sweep at width 8 ---
    for tbl_mb, rows in ((0.25, 1 << 13), (2, 1 << 16), (16, 1 << 19),
                         (128, 1 << 22)):
        tbl = jax.random.normal(key, (rows, 8), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, rows, jnp.int32)
        sec = timeit(lambda t, i: t[i].sum(), tbl, idx)
        report(f"B w=8 table={tbl_mb}MB", sec, N)

    # --- C: sorted vs random indices ---
    rows = 1 << 19
    tbl = jax.random.normal(key, (rows, 8), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, rows, jnp.int32)
    idx_sorted = jnp.sort(idx)
    sec = timeit(lambda t, i: t[i].sum(), tbl, idx_sorted)
    report("C sorted indices w=8 table=16MB", sec, N)
    # near-sorted: block-local (the raster/tile pattern)
    idx_local = (jnp.arange(N, dtype=jnp.int32) * rows // N
                 + jax.random.randint(key, (N,), 0, 64, jnp.int32)) % rows
    sec = timeit(lambda t, i: t[i].sum(), tbl, idx_local)
    report("C local indices w=8 table=16MB", sec, N)

    # --- D: k independent gathers in one jit (overlap?) ---
    idx2 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows, jnp.int32)

    def two(t, i, j):
        return t[i].sum() + t[j].sum()

    sec = timeit(two, tbl, idx, idx2)
    report("D two independent gathers (per-row over both)", sec, 2 * N)

    # --- E: gather expressed as take_along_axis over minor dim ---
    # table (R, 128); per output element select a lane. XLA may use a
    # different lowering for minor-dim dynamic indexing.
    R = 1 << 12
    tblL = jax.random.normal(key, (R, 128), jnp.float32)
    lane = jax.random.randint(key, (R, 128), 0, 128, jnp.int32)
    sec = timeit(lambda t, l: jnp.take_along_axis(t, l, axis=1).sum(),
                 tblL, lane)
    report(f"E lane-select take_along_axis ({R * 128} elems)", sec, R * 128)

    # --- F: one-hot matmul gather (small table) ---
    for R in (128, 512):
        tblS = jax.random.normal(key, (R, 128), jnp.float32)
        idxS = jax.random.randint(key, (N >> 4,), 0, R, jnp.int32)

        def onehot_gather(t, i, R=R):
            oh = jax.nn.one_hot(i, R, dtype=jnp.bfloat16)
            return (oh @ t.astype(jnp.bfloat16)).astype(jnp.float32).sum()

        sec = timeit(onehot_gather, tblS, idxS)
        report(f"F one-hot matmul gather R={R} w=128", sec, N >> 4)

    # --- G: gather of (N,) scalars via reshape to 2D result layouts ---
    tbl1 = jax.random.normal(key, (rows,), jnp.float32)
    idxG = jax.random.randint(key, (N,), 0, rows, jnp.int32)
    idx2d = idxG.reshape(-1, 128)
    sec = timeit(lambda t, i: t[i].sum(), tbl1, idx2d)
    report("G scalar gather, (n,128)-shaped indices", sec, N)
    idx2d8 = idxG.reshape(8, -1)
    sec = timeit(lambda t, i: t[i].sum(), tbl1, idx2d8)
    report("G scalar gather, (8,n)-shaped indices", sec, N)

    # --- H: uint32 vs f32 rows ---
    tblU = jax.random.randint(key, (rows, 8), 0, 2**31 - 1, jnp.int32
                              ).astype(jnp.uint32)
    sec = timeit(lambda t, i: t[i].astype(jnp.float32).sum(), tblU, idx)
    report("H u32 rows w=8", sec, N)


if __name__ == "__main__":
    main()
