"""Does stacking the two cascade PCF evaluations (c and c_next) into ONE
batched poisson_pcf_windowed call beat two sequential calls? (One gather
of 4.1M rows vs two of 2.07M; shared tap-math fusion.)

Also: shadow-atlas kernel tile_h=4 vs 8, and TILES_PER_PROG scan.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.ops import shadows as sh

H, W, S = 1080, 1920, 2048


def t(fn, *args, reps=4):
    def s(*a):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fn(*a)))
    g = jax.jit(s)
    _ = float(g(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:S, 0:S]
    base = np.sin(xx / 97.0) + np.sin(yy / 61.0) + np.sin((xx + yy) / 143.0)
    maps = np.where(base[None] > 0.2, 1.0, 0.12).astype(np.float32)
    maps = np.repeat(maps, 4, axis=0)[:4]
    swin = jax.jit(sh.superwindow_maps_u16)(jnp.asarray(maps))
    swin.block_until_ready()

    u = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    v = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    d = np.full((H, W), 0.5, np.float32)
    pos = jnp.asarray(np.stack([u, v, d, np.ones_like(u)], -1))
    casc = jnp.asarray(rng.integers(0, 3, (H, W)).astype(np.int32))
    casc_n = jnp.minimum(casc + 1, 3)
    # slightly different pos for the second cascade (realistic)
    pos_n = pos * jnp.asarray([0.98, 0.97, 1.0, 1.0])

    def two_calls(sw, c0, p0, c1, p1):
        return (sh.poisson_pcf_windowed(sw, c0, p0, S),
                sh.poisson_pcf_windowed(sw, c1, p1, S))

    def stacked(sw, c0, p0, c1, p1):
        cc = jnp.stack([c0, c1])
        pp = jnp.stack([p0, p1])
        f = sh.poisson_pcf_windowed(sw, cc, pp, S)
        return f[0], f[1]

    print(f"pcf two_calls  {t(two_calls, swin, casc, pos, casc_n, pos_n):8.2f} ms",
          flush=True)
    print(f"pcf stacked    {t(stacked, swin, casc, pos, casc_n, pos_n):8.2f} ms",
          flush=True)

    # correctness
    a = jax.jit(two_calls)(swin, casc, pos, casc_n, pos_n)
    b = jax.jit(stacked)(swin, casc, pos, casc_n, pos_n)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    print("stacked == two_calls OK", flush=True)


if __name__ == "__main__":
    main()
