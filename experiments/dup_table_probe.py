"""Probe: do K gather streams overlap better when they hit K PHYSICAL
COPIES of the table instead of one shared table?

pcf_split_probe measured 2 streams from one 134 MB table at 17.4 ns/row
but from two distinct 67 MB tables at 12.9 ns/row — the streams overlap
better across separate buffers. The frame has two more multi-stream
consumers hitting ONE table each:

  - SSAO: 14 tap streams x 518k rows from one (518k, 4)-f32 half-res
    depth table (8 MB, rebuilt per frame — a copy costs one 8 MB write);
  - aniso texturing: 4 probe streams x 2.07M rows from the ~50 MB pair
    pool (static — copies are free after init).

This probe measures both patterns with 1/2/4 table copies (streams
round-robin across copies; same indices, same total rows).

Run ON THE TPU: python -m experiments.dup_table_probe
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

    # --- SSAO-like: 14 streams x 518k rows, (518k, 4) f32 table ---------
    Hh, Wh = 540, 960
    N = Hh * Wh
    rows = N
    tbl = jax.random.normal(key, (rows, 4), jnp.float32)
    # tap indices: coherent base (pixel id) + per-tap bounded jitter, like
    # projected occluder taps landing near the receiver
    base = jnp.arange(N, dtype=jnp.int32)
    idxs = []
    for t in range(14):
        j = jax.random.randint(jax.random.PRNGKey(t), (N,), -40 * Wh // 8,
                               40 * Wh // 8, jnp.int32)
        idxs.append(jnp.clip(base + j, 0, rows - 1))
    idxs = jnp.stack(idxs)  # (14, N)

    def ssao_like(tables, idxs, k):
        acc = jnp.zeros((), jnp.float32)
        for t in range(14):
            acc = acc + tables[t % k][idxs[t]].sum()
        return acc

    for k in (1, 2, 4):
        tables = tuple(tbl + float(i) for i in range(k))  # force k buffers

        def run(idxs, *tabs, k=k):
            return ssao_like(tabs, idxs, k)

        sec = timeit(run, idxs, *tables)
        report(f"SSAO-like 14 streams, {k} table copies (8 MB each)",
               sec, 14 * N)

    # --- aniso-like: 4 streams x 2.07M rows, (1.6M, 8) u32 pool ---------
    H, W = 1080, 1920
    Np = H * W
    prows = 1 << 21  # x 32 B = 64 MB
    pool = jax.random.randint(key, (prows, 8), 0, 2**31 - 1,
                              jnp.int32).astype(jnp.uint32)
    pbase = (jnp.arange(Np, dtype=jnp.int32) * 7) % prows
    pidxs = jnp.stack([
        jnp.clip(pbase + jax.random.randint(jax.random.PRNGKey(10 + t),
                                            (Np,), -64, 64, jnp.int32),
                 0, prows - 1) for t in range(4)])

    def aniso_like(tables, idxs, k):
        acc = jnp.zeros((), jnp.uint32)
        for t in range(4):
            acc = acc + tables[t % k][idxs[t]].sum(dtype=jnp.uint32)
        return acc.astype(jnp.float32)

    for k in (1, 2, 4):
        tables = tuple(pool + jnp.uint32(i) for i in range(k))

        def run(idxs, *tabs, k=k):
            return aniso_like(tabs, idxs, k)

        sec = timeit(run, pidxs, *tables)
        report(f"aniso-like 4 streams, {k} pool copies (64 MB each)",
               sec, 4 * Np)

    # --- record-like: ONE stream — does a copy ever help a single
    # stream? (sanity: it should not) ------------------------------------
    rrows = 82_000
    rtbl = jax.random.normal(key, (rrows, 64), jnp.float32)
    ridx = (jnp.arange(Np, dtype=jnp.int32) * 13) % rrows
    sec = timeit(lambda t, i: t[i].sum(), rtbl, ridx)
    report("record-like 1 stream, 21 MB table (baseline)", sec, Np)


if __name__ == "__main__":
    main()
