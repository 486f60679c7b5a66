"""Probe: do XLA row gathers get cheaper when a fraction of the indices
are duplicates of one row?

Motivation: several per-pixel gathers in the frame fetch rows whose value
cannot affect the image — PCF superwindows for the second cascade where
the blend factor is exactly 0, and SSAO taps / resolve records / texture
probes at pixels with no geometry (the sky pass overwrites them, and the
bilateral blur's depth edge-stop rejects sky neighbors). If redirecting
those indices to row 0 makes the gather cheaper (cache-resident row), the
"dead-index collapse" saves real milliseconds with no image change.

Timing discipline per CLAUDE.md: reduce to one scalar inside the jit.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=4):
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
    print(f"{name:58s} {sec * 1e3:9.3f} ms {sec / rows * 1e9:7.2f} ns/row",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    N = 1 << 22  # 4.19M gather rows (PCF scale)

    # Two table sizes bracketing the real consumers: PCF superwindow pool
    # (~134 MB) and the SSAO half-res depth table (~8 MB).
    for tbl_mb, width in ((128, 32), (8, 8)):
        rows = (tbl_mb << 20) // (width * 4)
        tbl = jax.random.normal(key, (rows, width), jnp.float32)
        rnd = jax.random.randint(key, (N,), 0, rows, jnp.int32)
        # interleaved dead mask, like sky pixels scattered through bands
        u = jax.random.uniform(jax.random.PRNGKey(1), (N,))
        for frac in (0.0, 0.3, 0.5, 0.7, 0.9, 1.0):
            idx = jnp.where(u < frac, 0, rnd)
            sec = timeit(lambda t, i: t[i].sum(), tbl, idx)
            report(f"dup->row0 frac={frac} table={tbl_mb}MB w={width}",
                   sec, N)
        # dead rows redirected to the NEAREST live neighbor row instead of
        # row 0 (preserves locality, avoids one hot row): models clamping
        # the index instead of zeroing it.
        idx_n = jnp.where(u < 0.5, jnp.clip(rnd + 1, 0, rows - 1), rnd)
        sec = timeit(lambda t, i: t[i].sum(), tbl, idx_n)
        report(f"dup->neighbor frac=0.5 table={tbl_mb}MB w={width}", sec, N)

        # CONTIGUOUS dead span (models a sky region: top half of screen)
        idx_c = jnp.where(jnp.arange(N) < N // 2, 0, rnd)
        sec = timeit(lambda t, i: t[i].sum(), tbl, idx_c)
        report(f"dup->row0 contiguous 50% table={tbl_mb}MB w={width}",
               sec, N)

    # Does a SMALLER live index RANGE help (all live indices within the
    # first 2MB of the table)? Models sorting/bucketing dead pixels.
    rows = (128 << 20) // (32 * 4)
    tbl = jax.random.normal(key, (rows, 32), jnp.float32)
    small = jax.random.randint(key, (N,), 0, (2 << 20) // (32 * 4),
                               jnp.int32)
    sec = timeit(lambda t, i: t[i].sum(), tbl, small)
    report("live range 2MB within 128MB table w=32", sec, N)


if __name__ == "__main__":
    main()
