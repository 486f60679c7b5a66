"""Probe: headroom in the resolve-record gather and the SSAO tap gathers.

Two of the frame's four big gather consumers (PERF.md inventory):

  resolve records: 2.1M rows/frame from a (81k, 64) f32 table (21 MB),
    measured ~31 ms inside the fused frame (~14.8 ns/row) — i.e. at
    random-microbenchmark speed despite high spatial coherence. Suspect:
    neighboring pixels hit the SAME record row (a triangle covers ~25 px),
    and dup_gather_probe measured hot-row duplication as a SLOWDOWN.
  SSAO taps: 14 gathers x 518k rows from an 8 MB quad-row table,
    ~40 ms (~5.5 ns/row).

Questions measured here, each on PCF-probe-style realistic index fields:

  A. record row width: does shrinking 64 -> 48/32 lanes (21 -> 16/10 MB)
     buy anything? (row width was flat in gather_bench, but table size
     tiers exist);
  B. hot-block contention: same-row runs of ~25 px vs unique indices —
     quantifies what triangle-coverage duplication costs;
  C. 2-copy spread: duplicate the record table and split neighboring
     pixels across copies (kills duplicates, doubles table size);
  D. SSAO: 14 separate 518k-row gathers vs ONE fused 7.3M-row gather
     (split_gather measured k-way SPLITS as worse; is the converse,
     merging, a win?), and quad-row f32 (16 B) vs packed f32x2 (8 B).

Run ON THE TPU: python -m experiments.resolve_gather_probe
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
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


def report(name, sec, rows):
    print(f"{name:58s} {sec * 1e3:9.3f} ms  {sec / rows * 1e9:7.2f} ns/row",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    H, W = 1080, 1920
    N = H * W
    T = 81920  # ~config-5 record count

    # Realistic tid field: screen split into ~5x5 pixel cells, each cell
    # one record id, ids spatially smooth (neighboring cells near ids).
    cell = 5
    cy = (jnp.arange(H) // cell)
    cx = (jnp.arange(W) // cell)
    ncx = (W + cell - 1) // cell
    cid = (cy[:, None] * ncx + cx[None, :]).reshape(-1)
    tid_smooth = (cid * 977) % T  # smooth-ish spread over the table
    key, k2 = jax.random.split(key)
    tid_unique = jax.random.permutation(k2, jnp.arange(N) % T)

    # --- A: row width sweep on the smooth (duplicated) field ---
    for width in (128, 64, 48, 32):
        tbl = jax.random.normal(key, (T, width), jnp.float32)

        def one(t, i):
            return t[i].sum()

        sec = timeit(one, tbl, tid_smooth)
        mb = T * width * 4 / 1e6
        report(f"A rec width={width} ({mb:.0f}MB), smooth dup idx", sec, N)

    # --- B: duplication cost at width 64 ---
    tbl64 = jax.random.normal(key, (T, 64), jnp.float32)

    def one64(t, i):
        return t[i].sum()

    sec = timeit(one64, tbl64, tid_unique)
    report("B width=64, unique random idx", sec, N)
    sec = timeit(one64, tbl64, tid_smooth)
    report("B width=64, smooth 25x-dup idx", sec, N)

    # --- C: 2-copy / 4-copy spread of the duplicated field ---
    for copies in (2, 4):
        tblc = jnp.concatenate([tbl64] * copies, axis=0)
        # neighboring pixels alternate copies (checker in cell space)
        lane = (cid % copies) * T

        def spread(t, i, l):
            return t[i + l].sum()

        sec = timeit(spread, tblc, tid_smooth, lane)
        report(f"C width=64, {copies}-copy spread ({copies * 21}MB)", sec, N)

    # --- D: SSAO tap shape ---
    th, tw = 540, 960
    M = th * tw
    taps = 14
    quad = jax.random.normal(key, (M, 4), jnp.float32)
    keys = jax.random.split(key, taps)
    # taps land near the pixel: coherent index fields per tap
    base = jnp.arange(M) % M
    tap_idx = [
        (base + jax.random.randint(keys[i], (M,), -3000, 3000)) % M
        for i in range(taps)
    ]
    tap_idx = [i.astype(jnp.int32) for i in tap_idx]

    def sep(t, *idx):
        acc = 0.0
        for i in idx:
            acc = acc + t[i][:, 0].sum()
        return acc

    sec = timeit(sep, quad, *tap_idx)
    report("D quad16B, 14 separate gathers", sec, taps * M)

    fused_idx = jnp.stack(tap_idx).reshape(-1)

    def fused(t, i):
        return t[i][:, 0].sum()

    sec = timeit(fused, quad, fused_idx)
    report("D quad16B, 1 fused 7.3M gather", sec, taps * M)

    pair = jax.random.normal(key, (M, 2), jnp.float32)

    def sep2(t, *idx):
        acc = 0.0
        for i in idx:
            acc = acc + t[i][:, 0].sum()
        return acc

    sec = timeit(sep2, pair, *tap_idx)
    report("D pair8B (4MB), 14 separate gathers", sec, taps * M)

    scal = jax.random.normal(key, (M,), jnp.float32)

    def seps(t, *idx):
        acc = 0.0
        for i in idx:
            acc = acc + t[i].sum()
        return acc

    sec = timeit(seps, scal, *tap_idx)
    report("D scalar4B (2MB), 14 separate gathers", sec, taps * M)


if __name__ == "__main__":
    main()
