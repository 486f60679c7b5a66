"""Does splitting one row gather into K interleaved independent gathers
increase memory-level parallelism on v5e? (Test D in gather_bench showed
two independent gathers at 8.08 ns/row vs 11.28 single.)

Also: stacked-minor-dim gather (gather K rows per index entry) and
same-fusion multi-table variants.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def t(fn, *args, reps=4):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    g = jax.jit(scalarized)
    _ = float(g(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    rng = np.random.default_rng(0)
    N = 1 << 21  # 2.1M rows

    for table_mb, width in ((134, 128), (16, 128), (2, 4)):
        rows = table_mb * (1 << 20) // (width * 4)
        table = jnp.asarray(rng.random((rows, width), np.float32))
        idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
        table.block_until_ready()

        def single(tb, ix):
            return tb[ix]

        base = t(single, table, idx)
        print(f"table {table_mb:4d}MB w={width:3d} single "
              f"{base:8.2f} ms  {base*1e6/N:6.2f} ns/row", flush=True)

        for K in (2, 4, 8):
            def split(tb, ix, K=K):
                outs = [tb[ix[k::K]] for k in range(K)]
                return outs

            ms = t(split, table, idx)
            print(f"    split K={K}          {ms:8.2f} ms  "
                  f"{ms*1e6/N:6.2f} ns/row", flush=True)

    # does a fused elementwise consumer change things? (closer to real use)
    rows = 134 * (1 << 20) // (128 * 4)
    table = jnp.asarray(rng.random((rows, 128), np.float32))
    idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))

    def consume_single(tb, ix):
        return (tb[ix] * 2.0 + 1.0).sum(axis=-1)

    def consume_split4(tb, ix):
        outs = [(tb[ix[k::4]] * 2.0 + 1.0).sum(axis=-1) for k in range(4)]
        return outs

    print(f"134MB consumer single {t(consume_single, table, idx):8.2f} ms",
          flush=True)
    print(f"134MB consumer split4 {t(consume_split4, table, idx):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
