"""Multi-chip frame rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — its only
"parallelism" is the D3D12 hardware's internal SIMD plus 3-deep CPU/GPU
pipelining. The TPU-native scaling story is screen-space data parallelism:

- mesh axis ``sp`` (screen parallel): the frame buffer is sharded by pixel
  ROWS. Each device rasterizes the full (replicated) triangle soup into
  its own horizontal band — rasterization is embarrassingly parallel in
  screen space once triangle setup is replicated (setup is tiny: one
  einsum over vertices).
- shadow cascades are distributed over ``sp``: device d renders cascades
  d*k .. d*k+k-1 with k = ceil(C / n_dev) (one atlas launch per device)
  and the maps are combined with a single ``all_gather`` over ICI — every
  device needs the full shadow maps for PCF, and C x S^2 floats
  comfortably rides the interconnect.
- SSAO: occlusion is band-local but its projective occluder taps sample
  the ALL-GATHERED full half-res depth map (the taps land anywhere on
  screen — Ssao.hlsl:67-69), and the view-ray/random-texture grids use
  GLOBAL pixel rows. The bilateral blurs then run replicated on the
  all-gathered half-res maps (dense VPU work, ~2 MB — cheaper than a
  halo exchange per blur) and each device slices its band back out, so
  sharded SSAO is bit-identical to the single-chip pass.

Determinism note: band rendering translates screen coordinates per device,
which changes edge-function fp rounding — coverage at triangle silhouette
edges can flip by a sub-pixel relative to the single-chip render. Interior
pixels match exactly.

This module is exercised on a virtual 8-device CPU mesh in tests (both the
XLA rasterizer and the Pallas kernel in interpreter mode) and by
``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..ops import rasterizer as rz
from ..ops import raster_pallas as rp
from ..ops import ssao as ssao_ops
from ..passes import frame as fr


def _band_shadow_maps(scene: fr.DeviceScene, consts: fr.FrameConstants,
                      cfg: RenderConfig, n_dev: int, axis: str,
                      d) -> jnp.ndarray:
    """Cascade-parallel shadow maps: device d renders cascades
    d*k .. d*k+k-1 (k = ceil(C/n_dev); devices past C render redundant
    copies that the slice below discards), then one all_gather assembles
    the full (C, S, S) stack on every device."""
    C = cfg.num_cascades
    k = -(-C // n_dev)
    my_cascades = jnp.stack([(d * k + j) % C for j in range(k)])
    vps = consts.cascade_view_projs[my_cascades]  # (k, 4, 4)
    if cfg.use_pallas:
        my_maps = fr.render_shadow_atlas(scene, consts.shadow_visibility,
                                         vps, cfg)
    else:
        my_maps = jnp.stack([
            fr.render_one_shadow_map(scene, consts.shadow_visibility,
                                     vps[j], cfg) for j in range(k)])
    all_maps = jax.lax.all_gather(my_maps, axis)  # (n_dev, k, S, S)
    # device-major reshape puts cascade c at index c (devices past C
    # produced duplicates of cascades (d*k+j) % C, all at indices >= C)
    return all_maps.reshape(n_dev * k, *my_maps.shape[1:])[:C]


def _band_ssao(scene: fr.DeviceScene, consts: fr.FrameConstants,
               cfg: RenderConfig, normal_v, depth, n_dev: int, axis: str,
               d, band_h: int):
    """Band-exact SSAO (see module doc): band-local occlusion with
    all-gathered tap depth, replicated blur, slice own band."""
    n_half, d_half = fr.ssao_inputs_half(cfg, normal_v, depth)
    bh = band_h // cfg.ssao_scale  # band rows at SSAO res
    d_half_full = jax.lax.all_gather(d_half, axis).reshape(
        n_dev * bh, d_half.shape[1])
    band_field = jax.lax.dynamic_slice_in_dim(
        scene.ssao_random_field, d * bh, bh, axis=0)
    access = ssao_ops.ssao_occlusion(
        n_half, d_half, consts.proj, consts.inv_proj,
        scene.ssao_offsets, random_field=band_field,
        tap_depth=d_half_full, row_offset=d * bh,
        full_height=n_dev * bh)
    # blur on the full half-res maps (replicated; exact cross-band halos)
    access_full = jax.lax.all_gather(access, axis).reshape(
        n_dev * bh, access.shape[1])
    n_half_full = jax.lax.all_gather(n_half, axis).reshape(
        n_dev * bh, *n_half.shape[1:])
    access_full = fr.ssao_blur(scene, consts, cfg, access_full, n_half_full,
                               d_half_full)
    # upsample the FULL map then slice the band: bilinear edge handling at
    # band seams matches the single-chip upsample exactly
    up = fr._upsample_bilinear(access_full, cfg.height, cfg.width)
    return jax.lax.dynamic_slice_in_dim(up, d * band_h, band_h, axis=0)


def _band_render(scene: fr.DeviceScene, consts: fr.FrameConstants,
                 cfg: RenderConfig, n_dev: int, axis: str):
    """Per-device body: render this device's pixel band (full pipeline)."""
    d = jax.lax.axis_index(axis)
    band_h = cfg.height // n_dev
    H, W = cfg.height, cfg.width

    if cfg.shadows_enabled:
        shadow_maps = _band_shadow_maps(scene, consts, cfg, n_dev, axis, d)
    else:
        shadow_maps = jnp.ones((cfg.num_cascades, 2, 2), jnp.float32)

    # ---- main band: rasterize this device's tile rows of the FULL screen
    # (global tile anchors -> bit-identical fp math to the single-chip
    # render; no silhouette flips at band seams)
    tris, tri_attr = fr.main_view_tris(scene, consts, cfg)
    y0 = d * band_h  # first band pixel row (traced)
    tile_h = rp.TILE_H if cfg.use_pallas else rz.TILE_H
    nty = -(-H // tile_h)
    # static covering-tile-row count: enough rows for any band alignment
    # PLUS one halo pixel row below the band (uv derivatives at the seam)
    n_rows = min(-(-(band_h + tile_h) // tile_h), nty)
    tr0 = jnp.clip(y0 // tile_h, 0, nty - n_rows)
    band_cfg = dataclasses.replace(cfg, height=band_h)
    if cfg.use_pallas:
        depth, tid = rp.rasterize_pallas(tris, W, H, cfg.pair_capacity,
                                         interpret=cfg.pallas_interpret,
                                         tile_row_offset=tr0,
                                         num_tile_rows=n_rows)
    else:
        bins = rz.bin_triangles(tris, W, H, cfg.pair_capacity)
        depth, tid = rz.rasterize_binned(tris, bins, W, H, cfg.bin_cap,
                                         tile_row_offset=tr0,
                                         num_tile_rows=n_rows)
    # slice the band + 1 halo row (the slab is extended by one duplicate
    # row so the last band's slice stays in range; its halo contribution
    # is overridden by resolve_gbuffer's last-image-row derivative rule)
    local_y = y0 - tr0 * tile_h
    depth = jnp.concatenate([depth, depth[-1:]], axis=0)
    tid = jnp.concatenate([tid, tid[-1:]], axis=0)
    depth = jax.lax.dynamic_slice_in_dim(depth, local_y, band_h + 1, axis=0)
    tid = jax.lax.dynamic_slice_in_dim(tid, local_y, band_h + 1, axis=0)

    if cfg.alpha_test_enabled and scene.alpha is not None:
        # AlphaTested layer: dense peel over the band's GLOBAL pixel rows
        # (+ the halo row) — same math as the single-chip merge, so band
        # output stays bit-identical
        depth, tid, tris, tri_attr = fr.alpha_merge_main(
            scene, consts, cfg, depth, tid, tris, tri_attr,
            row_offset=y0.astype(jnp.float32))
        if cfg.shadows_enabled:
            shadow_maps = fr.alpha_merge_shadow(scene, consts, cfg,
                                                shadow_maps)

    g = fr.resolve_gbuffer(scene, consts, band_cfg, tris, depth, tid,
                           tri_attr, row_offset=y0, full_height=H,
                           out_rows=band_h)
    depth = depth[:band_h]

    if cfg.ssao_enabled:
        ambient_access = _band_ssao(scene, consts, cfg, g["normal_v"],
                                    depth, n_dev, axis, d, band_h)
    else:
        ambient_access = jnp.ones((band_h, W), jnp.float32)

    img = fr.lighting_pass(scene, consts, band_cfg, g, shadow_maps,
                           ambient_access, depth,
                           row_offset=(d * band_h).astype(jnp.float32),
                           full_height=H)
    return img


def render_frame_sharded(scene: fr.DeviceScene, consts: fr.FrameConstants,
                         cfg: RenderConfig, mesh: Mesh,
                         axis: str = "sp") -> jnp.ndarray:
    """Full frame over an n-device mesh; returns (H, W, 4) sharded by rows."""
    n_dev = mesh.shape[axis]
    assert cfg.height % n_dev == 0, "height must divide across devices"
    assert (cfg.height // n_dev) % cfg.ssao_scale == 0 or \
        not cfg.ssao_enabled, "band height must divide by ssao_scale"

    fn = shard_map(
        functools.partial(_band_render, cfg=cfg, n_dev=n_dev, axis=axis),
        mesh=mesh,
        in_specs=(P(), P()),  # scene + consts replicated
        out_specs=P(axis),  # image sharded by rows
        # the per-band scan carries start replicated and become varying
        # (band depends on axis_index); skip the vma check
        check_vma=False,
    )
    return fn(scene, consts)


def make_mesh(n_devices: int = None, axis: str = "sp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
