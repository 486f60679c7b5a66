"""Pallas TPU rasterization kernel.

The pure-XLA tiled rasterizer (rasterizer.rasterize_binned) expresses the
right algorithm but XLA materializes the per-tile (tri-block x pixels)
edge-function tensors to HBM, making it bandwidth-bound (~775 ms/frame at
1080p measured). This kernel keeps the whole inner loop in VMEM:

- grid = one program per 8x128-pixel screen tile;
- per-tile triangle runs are CONTIGUOUS in the sorted pair array (the
  binning sort's purpose), so the kernel streams its run with sliced,
  double-buffered async DMA — no gathers;
- per-tile (start, count) arrive via scalar prefetch, and the block loop
  has a DYNAMIC trip count: empty tiles cost ~nothing (the D3D12
  hardware's tile binning, recreated in software);
- the z-buffer and triangle-id buffer live in VMEM/registers across the
  loop; edge/depth evaluation is broadcast FMA over a (1024 pixels x
  TB tris) layout (pixels on sublanes, triangles on lanes).

Record layout (built by `build_records`, transposed so a TB-wide slice is
one native (16, 128) f32 tile): rows 0-2 = edge A coeffs, 3-5 = B, 6-8 =
TILE-LOCAL C (evaluated at the pair's tile origin, which keeps |E| small
inside the tile for fp32 precision; top-left-rule bias pre-applied),
9-11 = tile-local depth plane (zA, zB, zC_local), 12 = triangle id as f32,
13-15 = padding.

Fill-rule note: vertex coordinates are snapped to 1/256-pixel fixed point
in `setup` (like D3D's 8-bit subpixel rasterizer), so the top-left rule is
an exact epsilon bias on C for in-tile coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rasterizer as rz

TILE_H = 8
TILE_W = 128
TRI_BLOCK = 128
SUBPIXEL = 256.0  # 1/256-pixel snapping (D3D subpixel grid)
# exact epsilon: snapped edge values are multiples of 1/SUBPIXEL^2
EDGE_EPS = 0.5 / (SUBPIXEL * SUBPIXEL)
REC_ROWS = 16
ID_NONE = 3.0e7  # sentinel id (< 2^25 so float32-exact comparisons hold)


def snap_xy(xy: jnp.ndarray) -> jnp.ndarray:
    return jnp.round(xy * SUBPIXEL) / SUBPIXEL


def build_records(tris: rz.ScreenTris, bins: rz.Bins, ntx: int) -> jnp.ndarray:
    """Per-PAIR records (16, P) f32 in sorted-by-tile order, with edge and
    depth planes re-anchored at each pair's tile origin."""
    xy = snap_xy(tris.xy)
    A, B, C, area2, top_left = rz._edge_coeffs(xy)
    inv_a2 = 1.0 / jnp.where(area2 == 0, 1.0, area2)
    zA = (A * tris.z * inv_a2[:, None]).sum(-1)
    zB = (B * tris.z * inv_a2[:, None]).sum(-1)
    zC = (C * tris.z * inv_a2[:, None]).sum(-1)

    tri = bins.order  # (P,) sorted pair -> tri
    tile = bins.sorted_tile  # invalid pairs carry the sentinel tile id;
    # their records are garbage but no tile's (start, count) run reaches
    # them, and the kernel's tail mask rejects lanes past the run.
    x0 = ((tile % ntx) * TILE_W).astype(jnp.float32)
    y0 = ((tile // ntx) * TILE_H).astype(jnp.float32)

    Ap = A[tri]  # (P, 3)
    Bp = B[tri]
    # local C at tile origin + top-left bias
    Cp = (C[tri] + Ap * x0[:, None] + Bp * y0[:, None]
          - jnp.where(top_left[tri], 0.0, EDGE_EPS))
    zCp = zC[tri] + zA[tri] * x0 + zB[tri] * y0

    ids = tri.astype(jnp.float32)
    pad = jnp.zeros_like(ids)
    rec = jnp.stack(
        [Ap[:, 0], Ap[:, 1], Ap[:, 2],
         Bp[:, 0], Bp[:, 1], Bp[:, 2],
         Cp[:, 0], Cp[:, 1], Cp[:, 2],
         zA[tri], zB[tri], zCp, ids, pad, pad, pad], axis=0)  # (16, P)
    return rec


def _raster_kernel(start_blocks_ref, counts_ref, records_hbm, depth_ref,
                   tid_ref, rec_buf, sem):
    i = pl.program_id(0)
    start_blk = start_blocks_ref[i]
    count = counts_ref[i]

    P = TILE_H * TILE_W
    # tile-local pixel centers in flat (P, 1) layout (row-major within the
    # tile); Mosaic can't reshape (8,128)<->(1024,1), so everything in the
    # kernel stays (P, 1) and tiles are reassembled outside.
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pidx % TILE_W).astype(jnp.float32) + 0.5
    py = (pidx // TILE_W).astype(jnp.float32) + 0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TRI_BLOCK), 1)

    nblk = pl.cdiv(count, TRI_BLOCK)

    def dma(slot, b):
        # runs are padded to whole TRI_BLOCK blocks (see pad_runs), so a
        # block index fully addresses an aligned (16, TRI_BLOCK) slab
        return pltpu.make_async_copy(
            records_hbm.at[:, start_blk + b, :],
            rec_buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nblk > 0)
    def _():
        dma(0, 0).start()

    def body(b, carry):
        zmin, idbest = carry
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nblk)
        def _():
            dma(jax.lax.rem(b + 1, 2), b + 1).start()

        dma(slot, b).wait()
        rec = rec_buf[slot]  # (16, TRI_BLOCK)

        # tail masking: lanes past the run's true count are padding
        valid = lane < (count - b * TRI_BLOCK)

        E0 = px * rec[0:1, :] + (py * rec[3:4, :] + rec[6:7, :])
        E1 = px * rec[1:2, :] + (py * rec[4:5, :] + rec[7:8, :])
        E2 = px * rec[2:3, :] + (py * rec[5:6, :] + rec[8:9, :])
        cov = (jnp.minimum(jnp.minimum(E0, E1), E2) >= 0.0) & valid
        z = px * rec[9:10, :] + (py * rec[10:11, :] + rec[11:12, :])
        z = jnp.where(cov & (z >= 0.0) & (z <= 1.0), z, jnp.inf)
        zb = jnp.min(z, axis=1, keepdims=True)  # (P, 1)
        ids = jnp.where(z == zb, rec[12:13, :], jnp.inf)
        idb = jnp.min(ids, axis=1, keepdims=True)
        better = zb < zmin
        zmin = jnp.where(better, zb, zmin)
        idbest = jnp.where(better, idb, idbest)
        return zmin, idbest

    z0 = jnp.full((P, 1), 1.0, dtype=jnp.float32)
    id0 = jnp.full((P, 1), ID_NONE, dtype=jnp.float32)
    zmin, idbest = jax.lax.fori_loop(0, nblk, body, (z0, id0))

    depth_ref[:, :] = zmin
    tid_ref[:, :] = jnp.where(idbest < ID_NONE, idbest,
                              -1.0).astype(jnp.int32)


def pad_runs(bins: rz.Bins, records: jnp.ndarray, num_tiles: int,
             pair_capacity: int):
    """Repack the sorted pair records so every tile's run starts at a
    TRI_BLOCK boundary (DMA slabs must be tile-aligned on TPU).

    Returns (start_blocks (num_tiles,) int32 — block index of each run,
    records3 (16, NB, TRI_BLOCK)).
    """
    aligned = -(-bins.counts // TRI_BLOCK) * TRI_BLOCK  # per-tile padded len
    padded_starts = jnp.cumsum(aligned) - aligned
    p_pad = pair_capacity + num_tiles * TRI_BLOCK  # static upper bound

    pair_pos = jnp.arange(bins.order.shape[0], dtype=jnp.int32)
    in_run = bins.sorted_tile < num_tiles
    tile_c = jnp.clip(bins.sorted_tile, 0, num_tiles - 1)
    dst = padded_starts[tile_c] + (pair_pos - bins.starts[tile_c])
    dst = jnp.where(in_run, dst, p_pad)  # dropped by scatter mode below

    rec_pad = jnp.zeros((records.shape[0], p_pad), records.dtype)
    rec_pad = rec_pad.at[:, dst].set(records, mode="drop")
    records3 = rec_pad.reshape(records.shape[0], p_pad // TRI_BLOCK,
                               TRI_BLOCK)
    return (padded_starts // TRI_BLOCK).astype(jnp.int32), records3


def rasterize_pallas(tris: rz.ScreenTris, width: int, height: int,
                     pair_capacity: int, interpret: bool = False):
    """Full pipeline: bin (XLA) + raster (Pallas kernel).

    Triangle setup must use the same snapped coordinates the records use,
    so callers should pass `tris` from rz.setup_triangles unchanged — the
    snapping happens inside build_records (binning bboxes stay
    conservative either way).

    Returns (depth (H, W) f32, tid (H, W) i32).
    """
    ntx = -(-width // TILE_W)
    nty = -(-height // TILE_H)
    num_tiles = ntx * nty

    bins = rz.bin_triangles(tris, width, height, pair_capacity,
                            tile_h=TILE_H, tile_w=TILE_W)
    records = build_records(tris, bins, ntx)
    start_blocks, records = pad_runs(bins, records, num_tiles,
                                     pair_capacity)

    kernel = _raster_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((TILE_H * TILE_W, 1), lambda i, *_: (i, 0)),
            pl.BlockSpec((TILE_H * TILE_W, 1), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, REC_ROWS, TRI_BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    P = TILE_H * TILE_W
    depth_flat, tid_flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles * P, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * P, 1), jnp.int32),
        ],
        interpret=interpret,
    )(start_blocks, bins.counts, records)

    def assemble(flat):
        img = flat.reshape(nty, ntx, TILE_H, TILE_W)
        img = img.transpose(0, 2, 1, 3).reshape(nty * TILE_H, ntx * TILE_W)
        return img[:height, :width]

    return assemble(depth_flat), assemble(tid_flat)
