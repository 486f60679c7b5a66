"""Probe: replace the raster kernel's per-block plane MATMUL with VPU
broadcast FMA.

The shipping kernel evaluates all 4 planes (3 edges + depth) per
TRI_BLOCK as one (16, TB) x (16, 4P) dot_general at HIGHEST precision.
That contraction dim is 16 on a 128-deep MXU (and HIGHEST multiplies
passes), so the matmul costs ~8x its useful work — at 404k atlas pairs
(3.2k blocks) the kernel measures ~20 us/block, far above the VPU/DMA
floor. The same planes are 2 FMAs each in (TB, P) layout with
(TB,1)x(1,P) broadcasts.

Variants on the real config-5 shadow-atlas workload:
  matmul : the shipping kernel (ops.raster_pallas)
  fma_t  : FMA after an in-kernel (16,TB) -> (TB,16) transpose
  fma_l  : FMA from records pre-transposed in HBM as (NB, TB, 16)

Run ON THE TPU:  python -m experiments.fma_kernel_probe
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crychic_renderer_tpu.ops import raster_pallas as rp
from crychic_renderer_tpu.ops import rasterizer as rz

TILE_W = rp.TILE_W
TRI_BLOCK = rp.TRI_BLOCK


def _fma_kernel(starts_ref, counts_ref, records_hbm, depth_ref, *rest,
                tile_h: int, with_ids: bool, with_xrange: bool,
                tpp: int, layout: str):
    """rp._raster_kernel with the plane matmul replaced by broadcast FMA.

    layout='t': records are the shipping (16, NB, TB); each block is
    transposed in-kernel to (TB, 16).
    layout='l': records are (NB, TB, 16); columns slice out directly.
    """
    if with_ids:
        tid_ref = rest[0]
        acc_z, acc_id, rec_buf, sem = rest[1:]
    else:
        tid_ref = None
        acc_id = None
        acc_z, rec_buf, sem = rest

    i = pl.program_id(0)
    P = tile_h * TILE_W
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pidx % TILE_W).astype(jnp.float32) + 0.5
    py = (pidx // TILE_W).astype(jnp.float32) + 0.5
    sub = jax.lax.broadcasted_iota(jnp.int32, (TRI_BLOCK, 1), 0)

    base = i * tpp
    s0 = starts_ref[base]
    pend = (starts_ref[base + tpp - 1] + counts_ref[base + tpp - 1])
    first_blk = s0 // TRI_BLOCK
    nblk = jax.lax.select(pend > first_blk * TRI_BLOCK,
                          pl.cdiv(pend - first_blk * TRI_BLOCK, TRI_BLOCK),
                          0)

    acc_z[...] = jnp.full((tpp, P), 1.0, jnp.float32)
    if with_ids:
        acc_id[...] = jnp.full((tpp, P), rp.ID_NONE, jnp.float32)

    def dma(slot, b):
        if layout == "l":
            return pltpu.make_async_copy(
                records_hbm.at[first_blk + b], rec_buf.at[slot],
                sem.at[slot])
        return pltpu.make_async_copy(
            records_hbm.at[:, first_blk + b, :], rec_buf.at[slot],
            sem.at[slot])

    @pl.when(nblk > 0)
    def _():
        dma(0, 0).start()

    def body(b, carry):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nblk)
        def _():
            dma(jax.lax.rem(b + 1, 2), b + 1).start()

        dma(slot, b).wait()
        rec = rec_buf[slot]
        recT = rec.T if layout == "t" else rec  # (TB, 16)

        def col(k):
            return recT[:, k:k + 1]  # (TB, 1)

        # planes via broadcast FMA: (TB,1) * (1,P) -> (TB,P)
        E0 = col(0) * px + col(3) * py + col(6)
        E1 = col(1) * px + col(4) * py + col(7)
        E2 = col(2) * px + col(5) * py + col(8)
        cov = jnp.minimum(jnp.minimum(E0, E1), E2) >= 0.0
        if with_xrange:
            cov = cov & (px >= col(13)) & (px < col(14))
        z = col(9) * px + col(10) * py + col(11)
        z = jnp.where(cov & (z >= 0.0) & (z <= 1.0), z, jnp.inf)
        if with_ids:
            ids_col = col(12)

        g = (first_blk + b) * TRI_BLOCK + sub
        blo = (first_blk + b) * TRI_BLOCK
        bhi = blo + TRI_BLOCK
        for t in range(tpp):
            s_t = starts_ref[base + t]
            c_t = counts_ref[base + t]
            e_t = s_t + c_t

            @pl.when((s_t < bhi) & (e_t > blo) & (c_t > 0))
            def _(t=t, s_t=s_t, e_t=e_t):
                m = (g >= s_t) & (g < e_t)
                zt = jnp.where(m, z, jnp.inf)
                zb = jnp.min(zt, axis=0, keepdims=True)
                prev = acc_z[t:t + 1, :]
                better = zb < prev
                acc_z[t:t + 1, :] = jnp.where(better, zb, prev)
                if with_ids:
                    ids = jnp.where(zt == zb, ids_col, jnp.inf)
                    idb = jnp.min(ids, axis=0, keepdims=True)
                    prev_id = acc_id[t:t + 1, :]
                    acc_id[t:t + 1, :] = jnp.where(better, idb, prev_id)

        return carry

    jax.lax.fori_loop(0, nblk, body, 0)

    depth_ref[...] = acc_z[...]
    if with_ids:
        idv = acc_id[...]
        tid_ref[...] = jnp.where(idv < rp.ID_NONE, idv, -1.0).astype(
            jnp.int32)


def rasterize_fma(tris, width, height, pair_capacity, tile_h=rp.TILE_H,
                  with_ids=True, xrange=None, tiles_per_prog=16,
                  layout="t"):
    tpp = tiles_per_prog
    ntx = -(-width // TILE_W)
    nty = -(-height // tile_h)
    num_tiles = ntx * nty
    bins = rz.bin_triangles(tris, width, height, pair_capacity,
                            tile_h=tile_h, tile_w=TILE_W)
    records = rp.build_records(tris, bins, ntx, num_tiles, tile_h, xrange)
    if layout == "l":
        records = records.transpose(1, 2, 0)  # (NB, TB, 16)

    grid_tiles = num_tiles
    starts_g, counts_g = bins.starts, bins.counts
    num_progs = -(-grid_tiles // tpp)
    pad_tiles = num_progs * tpp - grid_tiles
    if pad_tiles:
        starts = jnp.concatenate(
            [starts_g, jnp.full((pad_tiles,), bins.num_valid, jnp.int32)])
        counts = jnp.pad(counts_g, (0, pad_tiles))
    else:
        starts, counts = starts_g, counts_g

    kernel = functools.partial(_fma_kernel, tile_h=tile_h,
                               with_ids=with_ids,
                               with_xrange=xrange is not None, tpp=tpp,
                               layout=layout)
    P = tile_h * TILE_W
    out_spec = pl.BlockSpec((tpp, P), lambda i, *_: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((num_progs * tpp, P), jnp.float32)]
    out_specs = [out_spec]
    if with_ids:
        out_shape.append(jax.ShapeDtypeStruct((num_progs * tpp, P),
                                              jnp.int32))
        out_specs.append(out_spec)
    scratch = [pltpu.VMEM((tpp, P), jnp.float32)]
    if with_ids:
        scratch.append(pltpu.VMEM((tpp, P), jnp.float32))
    buf_shape = ((2, TRI_BLOCK, rp.REC_ROWS) if layout == "l"
                 else (2, rp.REC_ROWS, TRI_BLOCK))
    scratch += [pltpu.VMEM(buf_shape, jnp.float32),
                pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_progs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shape)(starts, counts, records)
    depth_flat = outs[0][:grid_tiles]
    tid_flat = outs[1][:grid_tiles] if with_ids else None

    def assemble(flat):
        img = flat.reshape(nty, ntx, tile_h, TILE_W)
        img = img.transpose(0, 2, 1, 3).reshape(nty * tile_h, ntx * TILE_W)
        return img[:height, :width]

    return assemble(depth_flat), (assemble(tid_flat) if with_ids else None)


def main():
    from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
    from crychic_renderer_tpu.app.renderer import Renderer
    from crychic_renderer_tpu.passes import frame as fr

    scene, cfg, lights = CONFIGS[5]()
    r = Renderer(scene, cfg, lights=lights)
    cfg = r.cfg
    consts = r.frame_constants(0.0)
    s_tris, xr = fr.shadow_atlas_tris(r.device_scene,
                                      consts.shadow_visibility,
                                      consts.cascade_view_projs, cfg)
    m_tris, _ = fr.main_view_tris(r.device_scene, consts, cfg)
    S, C = cfg.shadow_map_size, cfg.num_cascades

    def timeit(fn, *a, iters=6):
        f = jax.jit(fn)
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            o = f(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    # scalarize for the tunnel: sum inside jit
    def run(fn, tris, *a, **k):
        def g(t):
            d, tid = fn(t, *a, **k)
            s = d.sum()
            if tid is not None:
                s = s + tid.sum().astype(jnp.float32)
            return s
        f = jax.jit(g)
        _ = float(f(tris))
        best = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(tris)
            _ = float(o)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print("== shadow atlas (404k pairs, no ids) ==", flush=True)
    base = run(lambda t: rp.rasterize_pallas(
        t, C * S, S, cfg.shadow_pair_capacity, tile_h=fr.SHADOW_TILE_H,
        with_ids=False, xrange=xr, tiles_per_prog=32), s_tris)
    print(f"matmul kernel: {base:.1f} ms", flush=True)
    for layout in ("t",):
        ms = run(lambda t, lo=layout: rasterize_fma(
            t, C * S, S, cfg.shadow_pair_capacity, tile_h=fr.SHADOW_TILE_H,
            with_ids=False, xrange=xr, tiles_per_prog=32, layout=lo),
            s_tris)
        print(f"fma_{layout} kernel: {ms:.1f} ms", flush=True)

    print("== main view (80k pairs, with ids) ==", flush=True)
    base = run(lambda t: rp.rasterize_pallas(
        t, cfg.width, cfg.height, cfg.pair_capacity), m_tris)
    print(f"matmul kernel: {base:.1f} ms", flush=True)
    for layout in ("t",):
        ms = run(lambda t, lo=layout: rasterize_fma(
            t, cfg.width, cfg.height, cfg.pair_capacity, layout=lo),
            m_tris)
        print(f"fma_{layout} kernel: {ms:.1f} ms", flush=True)

    # correctness: fma vs shipping kernel outputs
    d0, t0_ = jax.jit(lambda t: rp.rasterize_pallas(
        t, cfg.width, cfg.height, cfg.pair_capacity))(m_tris)
    for layout in ("t",):
        d1, t1 = jax.jit(lambda t, lo=layout: rasterize_fma(
            t, cfg.width, cfg.height, cfg.pair_capacity, layout=lo))(m_tris)
        dd = float(jnp.abs(d1 - d0).max())
        td = int((t1 != t0_).sum())
        print(f"fma_{layout} vs matmul: max|dz|={dd:.3e} "
              f"tid diffs={td}/{t1.size}", flush=True)


if __name__ == "__main__":
    main()
