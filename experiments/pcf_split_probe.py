"""Probe: does splitting the 134 MB PCF superwindow table by cascade
parity pay?

The PCF stage issues 2 row gathers per pixel (cascade c and c+1, the
deferred always-blend quirk) against ONE (4, 256, 256, 128)-u32 table =
134 MB, which sits in the slowest measured gather tier (>=128 MB ~ 24
ns/row; gather_bench.py only sampled 16 and 128 MB, nothing between).
Because c and c+1 always have opposite parity (c=3 blends with itself),
the two gathers can instead hit two half-size tables (cascades {0,2} and
{1,3}, 67 MB each) with no extra rows. This probe measures:

  A. the missing tier points: 512B-row gathers at 16/33/67/134 MB with
     PCF-like coherent indices (pixel-major, cascade varies smoothly);
  B. the actual two-table formulation vs the one-table formulation on
     the same index streams.

Run ON THE TPU: python -m experiments.pcf_split_probe
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
    N = H * W  # one gather per pixel per cascade slot

    # PCF-like coherent indices: screen-space pixel -> smooth block index
    # within a (nb, nb) block grid, cascade chosen by a radial-ish field.
    nb = 256
    yy = (jnp.arange(H, dtype=jnp.float32) / H * (nb - 2)).astype(jnp.int32)
    xx = (jnp.arange(W, dtype=jnp.float32) / W * (nb - 2)).astype(jnp.int32)
    qy = jnp.broadcast_to(yy[:, None], (H, W)).reshape(-1)
    qx = jnp.broadcast_to(xx[None, :], (H, W)).reshape(-1)
    r = jnp.hypot((qy.astype(jnp.float32) - nb / 2),
                  (qx.astype(jnp.float32) - nb / 2))
    c = jnp.clip((r / (nb / 2) * 4).astype(jnp.int32), 0, 3)

    # --- A: tier sweep, one 512B-row gather per pixel ---
    for n_casc, label_mb in ((1, 33), (2, 67), (4, 134)):
        tbl = jax.random.randint(
            key, (n_casc * nb * nb, 128), 0, 2**31 - 1, jnp.int32
        ).astype(jnp.uint32)
        cc = jnp.minimum(c, n_casc - 1)
        idx = (cc * nb + qy) * nb + qx

        def one(t, i):
            return t[i].sum(dtype=jnp.uint32).astype(jnp.float32)

        sec = timeit(one, tbl, idx)
        report(f"A 512B rows, table={label_mb}MB, 1 gather/px", sec, N)

    # --- B: the real formulation ---
    tbl4 = jax.random.randint(key, (4 * nb * nb, 128), 0, 2**31 - 1,
                              jnp.int32).astype(jnp.uint32)
    c1 = jnp.minimum(c + 1, 3)

    def one_table(t, c, c1, qy, qx):
        i0 = (c * nb + qy) * nb + qx
        i1 = (c1 * nb + qy) * nb + qx
        return (t[i0].sum(dtype=jnp.uint32)
                + t[i1].sum(dtype=jnp.uint32)).astype(jnp.float32)

    sec = timeit(one_table, tbl4, c, c1, qy, qx)
    report("B one 134MB table, 2 gathers/px (current)", sec, 2 * N)

    # parity split: E holds cascades {0,2} (slots 0,1), O holds {1,3}
    tblE = tbl4.reshape(4, nb * nb, 128)[jnp.asarray([0, 2])].reshape(-1, 128)
    tblO = tbl4.reshape(4, nb * nb, 128)[jnp.asarray([1, 3])].reshape(-1, 128)

    def two_tables(tE, tO, c, qy, qx):
        # even member of {c, c+1}: c if even else c+1 (c=3 -> dummy 2)
        ce = jnp.where(c % 2 == 0, c, jnp.minimum(c + 1, 2))
        co = jnp.where(c % 2 == 1, c, jnp.minimum(c + 1, 3))
        iE = ((ce >> 1) * nb + qy) * nb + qx
        iO = ((co >> 1) * nb + qy) * nb + qx
        return (tE[iE].sum(dtype=jnp.uint32)
                + tO[iO].sum(dtype=jnp.uint32)).astype(jnp.float32)

    sec = timeit(two_tables, tblE, tblO, c, qy, qx)
    report("B two 67MB parity tables, 2 gathers/px", sec, 2 * N)

    # quarter split for reference: 4 tables, still 2 live gathers/px is
    # impossible (c, c+1 span arbitrary pairs) — measure the masked
    # 4-gather form to confirm it loses.
    tbls = [tbl4.reshape(4, nb * nb, 128)[i] for i in range(4)]

    def four_tables(t0, t1, t2, t3, c, c1, qy, qx):
        i = qy * nb + qx
        acc = jnp.zeros((), jnp.uint32)
        for k, t in enumerate((t0, t1, t2, t3)):
            live = (c == k) | (c1 == k)
            acc = acc + jnp.where(live, t[i].sum(axis=-1, dtype=jnp.uint32),
                                  0).sum(dtype=jnp.uint32)
        return acc.astype(jnp.float32)

    sec = timeit(four_tables, *tbls, c, c1, qy, qx)
    report("B four 33MB tables, 4 masked gathers/px", sec, 4 * N)


if __name__ == "__main__":
    main()
