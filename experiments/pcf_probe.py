"""Isolate the Pallas PCF kernel regression (346 ms vs 157 ms XLA).

Times kernel VARIANTS on synthetic full-scale data (2.07M pixels,
(4,256,256,128) u32 superwindow table, ~50% uniform groups):

  v0_cond   : current kernel (lax.cond early-out per 8-px group)
  v1_noea   : always slow path, no cond
  v2_fast   : always fast path (bounds loop + load + demux overhead)
  v3_nored  : slow path without the jnp.all uniformity reduces
  gather    : the XLA row gather feeding the kernel, alone
  xla       : poisson_pcf_windowed (XLA reference) on the same inputs
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crychic_renderer_tpu.ops import shadows as sh

H, W, S = 1080, 1920, 2048
_PCF_GROUP = 1024
N_SAMPLE = sh.N_SAMPLE
POISSON_DISK = sh.POISSON_DISK


def t(fn, *args, reps=3):
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


def make_kernel(mode):
    def kern(win_ref, par_ref, out_ref):
        G = win_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def sxsy(f):
            q = f // 64
            inner = jax.lax.rem(f, 64)
            sy = (q // 2) * 8 + inner // 8
            sx = jax.lax.rem(q, 2) * 8 + jax.lax.rem(inner, 8)
            return sx.astype(jnp.float32), sy.astype(jnp.float32)

        sxe, sye = sxsy(2 * lane)
        sxo, syo = sxsy(2 * lane + 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, G // 8), 1)

        def body(i, acc):
            off = pl.multiple_of(8 * i, 8)
            w = pltpu.bitcast(win_ref[pl.ds(off, 8), :], jnp.int32)
            par = par_ref[pl.ds(off, 8), :]
            dq = par[:, 0:1]
            lo = (w & 0xFFFF).astype(jnp.float32)
            hi = ((w >> 16) & 0xFFFF).astype(jnp.float32)
            ce = dq <= lo
            co = dq <= hi

            def slow():
                fx = par[:, 1:2]
                fy = par[:, 2:3]
                cs = par[:, 3:4]
                sn = par[:, 4:5]
                we = jnp.zeros((8, 128), jnp.float32)
                wo = jnp.zeros((8, 128), jnp.float32)
                for tt in range(N_SAMPLE):
                    pxd, pyd = POISSON_DISK[tt]
                    tx = fx + (pxd * cs - pyd * sn) * 2.5
                    ty = fy + (pxd * sn + pyd * cs) * 2.5
                    we = we + (jnp.maximum(1.0 - jnp.abs(sxe - tx), 0.0)
                               * jnp.maximum(1.0 - jnp.abs(sye - ty), 0.0))
                    wo = wo + (jnp.maximum(1.0 - jnp.abs(sxo - tx), 0.0)
                               * jnp.maximum(1.0 - jnp.abs(syo - ty), 0.0))
                s = (ce.astype(jnp.float32) * we
                     + co.astype(jnp.float32) * wo).sum(axis=1,
                                                        keepdims=True)
                return s * jnp.float32(1.0 / N_SAMPLE)

            if mode == "v1_noea":
                res = slow()
            elif mode == "v2_fast":
                lit_all = jnp.all(ce) & jnp.all(co)
                res = jnp.where(lit_all, 1.0, 0.0) * jnp.ones((8, 1),
                                                              jnp.float32)
            elif mode == "v3_nored":
                res = slow()  # built below without the all() reduces
            else:  # v0_cond
                lit_all = jnp.logical_and(jnp.all(ce), jnp.all(co))
                dark_all = jnp.logical_and(jnp.all(~ce), jnp.all(~co))

                def fast():
                    return jnp.where(lit_all, 1.0, 0.0) * jnp.ones(
                        (8, 1), jnp.float32)

                res = jax.lax.cond(jnp.logical_or(lit_all, dark_all),
                                   fast, slow)
            return jnp.where(col == i, res, acc)

        out_ref[...] = jax.lax.fori_loop(
            0, G // 8, body, jnp.zeros((8, G // 8), jnp.float32))
    return kern


def run_kernel(mode, win_flat, par_flat):
    n_pad = win_flat.shape[0]
    num_progs = n_pad // _PCF_GROUP
    out = pl.pallas_call(
        make_kernel(mode),
        grid=(num_progs,),
        in_specs=[
            pl.BlockSpec((_PCF_GROUP, 128), lambda i: (i, 0)),
            pl.BlockSpec((_PCF_GROUP, 8), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, _PCF_GROUP // 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_progs * 8, _PCF_GROUP // 8),
                                       jnp.float32),
    )(win_flat, par_flat)
    return out


def main():
    rng = np.random.default_rng(0)
    # patchy shadow maps: smooth blobs of lit/shadow -> realistic uniform
    # group fraction
    yy, xx = np.mgrid[0:S, 0:S]
    base = (np.sin(xx / 97.0) + np.sin(yy / 61.0)
            + np.sin((xx + yy) / 143.0))
    maps = np.where(base[None] > 0.2, 1.0, 0.12).astype(np.float32)
    maps = np.repeat(maps, 4, axis=0)[:4]
    swin = jax.jit(sh.superwindow_maps_u16)(jnp.asarray(maps))
    swin.block_until_ready()

    u = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    v = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    # receiver depth 0.5: lit where map=1, shadowed where map=0.12
    d = np.full((H, W), 0.5, np.float32)
    pos = jnp.asarray(np.stack([u, v, d, np.ones_like(u)], -1))
    casc = jnp.asarray(rng.integers(0, 4, (H, W)).astype(np.int32))

    # build kernel inputs once (gather outside the timed kernels)
    inv_w = 1.0 / jnp.maximum(pos[..., 3], 1e-20)
    uvz = pos[..., :3] * inv_w[..., None]
    cx = uvz[..., 0] * S - 0.5
    cy = uvz[..., 1] * S - 0.5
    nb = swin.shape[1]
    x_lo = jnp.floor(cx).astype(jnp.int32) - 3
    y_lo = jnp.floor(cy).astype(jnp.int32) - 3
    qx0 = jnp.clip(x_lo >> 3, 0, nb - 1)
    qy0 = jnp.clip(y_lo >> 3, 0, nb - 1)
    flat = swin.reshape(-1, swin.shape[-1])
    idx = (casc * nb + qy0) * nb + qx0

    def gather_only(fl, ix):
        return fl[ix]

    print(f"gather(2.07M rows, {flat.nbytes/1e6:.0f}MB) "
          f"{t(gather_only, flat, idx.reshape(-1)):8.2f} ms", flush=True)

    window = jax.jit(gather_only)(flat, idx.reshape(-1))
    dq = (uvz[..., 2] * 65535.0 - 0.5).reshape(-1)
    theta = sh.nrand(uvz[..., :2])
    c_, sn_ = jnp.cos(theta), jnp.sin(theta)
    fx_base = (cx - (qx0 * 8).astype(jnp.float32)).reshape(-1)
    fy_base = (cy - (qy0 * 8).astype(jnp.float32)).reshape(-1)
    params = jnp.stack([dq, fx_base, fy_base, c_.reshape(-1),
                        sn_.reshape(-1)], axis=-1)
    n = H * W
    n_pad = -(-n // _PCF_GROUP) * _PCF_GROUP
    win_flat = jnp.pad(window, ((0, n_pad - n), (0, 0)))
    par_flat = jnp.pad(params, ((0, n_pad - n), (0, 3)),
                       constant_values=-1.0)
    win_flat.block_until_ready()

    # uniform-group fraction diagnostic
    wm = sh._unpack_u16_window(window[:n])
    cmpv = (dq[:n, None] <= wm)
    grp = cmpv.reshape(-1, 8, 256)
    uni = (grp.all(axis=(1, 2)) | (~grp).all(axis=(1, 2)))
    print(f"uniform 8-px group fraction: {float(uni.mean()):.3f}",
          flush=True)

    for mode in ("v2_fast", "v1_noea", "v0_cond"):
        fn = functools.partial(run_kernel, mode)
        print(f"{mode:10s} {t(fn, win_flat, par_flat):8.2f} ms",
              flush=True)

    def xla_pcf(sw, cc, pp):
        return sh.poisson_pcf_windowed(sw, cc, pp, S)

    print(f"xla(1call) {t(xla_pcf, swin, casc, pos):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
