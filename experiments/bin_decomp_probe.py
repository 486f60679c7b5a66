"""Decompose the binning + raster pipeline cost on the real config-5
workloads (shadow atlas: 1.1M triangle rows -> 404k pairs, cap 590k;
main view: 326k rows -> 80k pairs, cap 131k).

bin_triangles = per-tri bbox math + marks SCATTER (T updates) + cumsum +
packed GATHER (cap rows) + key SORT (cap keys) + run starts/counts.
build_records adds one cap-row gather; the kernel streams blocks.
This probe times each piece in isolation to find where the ~66 ms
shadow-atlas true cost actually lives.

Run ON THE TPU:  python -m experiments.bin_decomp_probe
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.ops import raster_pallas as rp


def timeit(fn, *a, iters=6):
    f = jax.jit(fn)
    out = f(*a)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()
                         if hasattr(jax.tree_util.tree_leaves(out)[0], "sum")
                         else jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        o = f(*a)
        _ = float(np.asarray(jax.tree_util.tree_leaves(o)[0].sum()))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def scalar_timeit(fn, *a, iters=6):
    def g(*aa):
        leaves = jax.tree_util.tree_leaves(fn(*aa))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    f = jax.jit(g)
    _ = float(f(*a))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        o = f(*a)
        _ = float(o)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def decompose(name, tris, width, height, cap, tile_h, xrange=None,
              with_ids=True, tpp=rp.TILES_PER_PROG):
    print(f"== {name}: cap={cap} ==", flush=True)
    ntx = -(-width // rp.TILE_W)
    nty = -(-height // tile_h)

    ms = scalar_timeit(
        lambda t: rz.bin_triangles(t, width, height, cap, tile_h=tile_h,
                                   tile_w=rp.TILE_W), tris)
    print(f"  bin_triangles total: {ms:.1f} ms", flush=True)

    # pieces (same shapes/dtypes as inside bin_triangles)
    tx0, ty0, bw, bh, _, _ = rz._tile_bbox(tris, width, height, tile_h,
                                           rp.TILE_W)
    counts = (bw * bh).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    T = counts.shape[0]

    ms = scalar_timeit(
        lambda t: rz._tile_bbox(t, width, height, tile_h, rp.TILE_W)[:4],
        tris)
    print(f"  bbox math ({T} rows): {ms:.1f} ms", flush=True)

    def marks_fn(off):
        return jnp.cumsum(jnp.zeros(cap, jnp.int32).at[off].add(
            1, mode="drop")) - 1

    ms = scalar_timeit(marks_fn, offsets)
    print(f"  marks scatter+cumsum ({T} updates -> {cap}): {ms:.1f} ms",
          flush=True)

    tri_of_pair = jnp.clip(marks_fn(offsets), 0, T - 1)
    packed = jnp.stack([offsets, bw, tx0, ty0], axis=-1)

    ms = scalar_timeit(lambda p, i: p[i], packed, tri_of_pair)
    print(f"  packed gather ({cap} rows): {ms:.1f} ms", flush=True)

    # the key sort: same key construction as bin_triangles
    pair_idx = jnp.arange(cap, dtype=jnp.int32)
    pp = packed[tri_of_pair]
    slot = pair_idx - pp[:, 0]
    bw_p = jnp.maximum(pp[:, 1], 1)
    ty = pp[:, 3] + slot // bw_p
    tx = pp[:, 2] + slot % bw_p
    key = (ty * ntx + tx).astype(jnp.int32)

    def sort_fn(k, v):
        return jax.lax.sort((k, v), num_keys=1)

    ms = scalar_timeit(sort_fn, key, tri_of_pair)
    print(f"  pair sort ({cap} keys): {ms:.1f} ms", flush=True)

    bins = jax.jit(lambda t: rz.bin_triangles(
        t, width, height, cap, tile_h=tile_h, tile_w=rp.TILE_W))(tris)

    ms = scalar_timeit(
        lambda t, b: rp.build_records(t, b, ntx, ntx * nty, tile_h,
                                      xrange), tris, bins)
    print(f"  build_records: {ms:.1f} ms", flush=True)

    records = jax.jit(lambda t, b: rp.build_records(
        t, b, ntx, ntx * nty, tile_h, xrange))(tris, bins)

    # kernel alone (records + starts/counts precomputed)
    def kernel_only(st, ct, rec):
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        num_tiles = ntx * nty
        num_progs = -(-num_tiles // tpp)
        pad_tiles = num_progs * tpp - num_tiles
        if pad_tiles:
            st = jnp.concatenate(
                [st, jnp.full((pad_tiles,), bins.num_valid, jnp.int32)])
            ct = jnp.pad(ct, (0, pad_tiles))
        kernel = functools.partial(rp._raster_kernel, tile_h=tile_h,
                                   with_ids=with_ids,
                                   with_xrange=xrange is not None, tpp=tpp)
        P = tile_h * rp.TILE_W
        out_spec = pl.BlockSpec((tpp, P), lambda i, *_: (i, 0))
        out_shape = [jax.ShapeDtypeStruct((num_progs * tpp, P),
                                          jnp.float32)]
        out_specs = [out_spec]
        if with_ids:
            out_shape.append(jax.ShapeDtypeStruct((num_progs * tpp, P),
                                                  jnp.int32))
            out_specs.append(out_spec)
        scratch = [pltpu.VMEM((tpp, P), jnp.float32)]
        if with_ids:
            scratch.append(pltpu.VMEM((tpp, P), jnp.float32))
        scratch += [pltpu.VMEM((2, rp.REC_ROWS, rp.TRI_BLOCK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(num_progs,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=out_specs, scratch_shapes=scratch)
        outs = pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=out_shape)(st, ct, rec)
        return outs[0]

    ms = scalar_timeit(kernel_only, bins.starts, bins.counts, records)
    print(f"  pallas kernel only: {ms:.1f} ms", flush=True)

    ms = scalar_timeit(
        lambda t: rp.rasterize_pallas(t, width, height, cap,
                                      tile_h=tile_h, with_ids=with_ids,
                                      xrange=xrange, tiles_per_prog=tpp),
        tris)
    print(f"  full rasterize_pallas: {ms:.1f} ms", flush=True)


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

    decompose("shadow atlas", s_tris, C * S, S, cfg.shadow_pair_capacity,
              fr.SHADOW_TILE_H, xrange=xr, with_ids=False, tpp=32)
    decompose("main view", m_tris, cfg.width, cfg.height,
              cfg.pair_capacity, rp.TILE_H)


if __name__ == "__main__":
    main()
