"""Multi-chip frame rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — its only
"parallelism" is the D3D12 hardware's internal SIMD plus 3-deep CPU/GPU
pipelining. The TPU-native scaling story is screen-space data parallelism:

- mesh axis ``sp`` (screen parallel): the frame buffer is sharded by pixel
  ROWS. Each device rasterizes the full (replicated) triangle soup into
  its own horizontal band — rasterization is embarrassingly parallel in
  screen space once triangle setup is replicated (setup is tiny: one
  einsum over vertices).
- shadow cascades are round-robined over ``sp`` (device d renders cascade
  d mod 4 band-complete) and combined with a single ``all_gather`` over
  ICI — every device needs the full shadow maps for PCF, and 4 x S^2
  floats comfortably rides the interconnect.
- screen-space filters (SSAO blur) run band-locally; the <=5-pixel halo at
  band seams uses clamp-to-band (a 1-row ppermute halo exchange is the
  planned refinement).

Determinism note: band rendering translates screen coordinates per device,
which changes edge-function fp rounding — coverage at triangle silhouette
edges can flip by a sub-pixel relative to the single-chip render. Interior
pixels match exactly.

This module is exercised on a virtual CPU mesh in tests and by
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
from ..passes import frame as fr


def _band_render(scene: fr.DeviceScene, consts: fr.FrameConstants,
                 cfg: RenderConfig, n_dev: int, axis: str):
    """Per-device body: render this device's pixel band (full pipeline)."""
    d = jax.lax.axis_index(axis)
    band_h = cfg.height // n_dev
    H, W = cfg.height, cfg.width

    # ---- shadow maps: each device renders cascade (d % C), all-gather ----
    if cfg.shadows_enabled:
        C = cfg.num_cascades
        my_c = d % C
        vp = consts.cascade_view_projs[my_c]
        shadow_cfg = dataclasses.replace(cfg, use_pallas=False)
        my_map = fr.render_one_shadow_map(scene, consts.shadow_visibility,
                                          vp, shadow_cfg)
        all_maps = jax.lax.all_gather(my_map, axis)  # (n_dev, S, S)
        # devices d and d+C computed the same cascade; take the first C
        shadow_maps = all_maps[:C] if n_dev >= C else jnp.concatenate(
            [all_maps] * (-(-C // n_dev)), axis=0)[:C]
    else:
        shadow_maps = jnp.ones((cfg.num_cascades, 2, 2), jnp.float32)

    # ---- main band: shift the viewport so this band is rows [0, band_h) --
    from ..ops import clipping

    pos_w, nrm_w, tan_w, uv, clip = fr.vertex_stage(
        scene.opaque, consts.opaque_visibility, consts.view_proj,
        scene.mat_transform)
    tri_attr = fr.build_tri_attrs(scene.opaque, pos_w, nrm_w, tan_w, uv,
                                  clip)
    tri_attr, tri_valid = clipping.clip_near(
        tri_attr, jnp.ones(tri_attr.shape[0], bool))
    tris = rz.setup_tri_verts(tri_attr[..., :4], tri_valid, W, H)
    y_off = (d * band_h).astype(jnp.float32)
    tris = tris._replace(
        xy=tris.xy - jnp.stack([jnp.zeros_like(y_off), y_off])[None, None, :])
    band_cfg = dataclasses.replace(cfg, height=band_h, use_pallas=False)
    bins = rz.bin_triangles(tris, W, band_h, cfg.pair_capacity)
    depth, tid = rz.rasterize_binned(tris, bins, W, band_h, cfg.bin_cap)

    g = fr.resolve_gbuffer(scene, consts, band_cfg, tris, depth, tid,
                           tri_attr)
    # resolve_gbuffer computed barycentrics at band-local pixel centers,
    # which is exactly right because tris.xy was shifted.

    if cfg.ssao_enabled:
        access_half = fr.ssao_pass(scene, consts, band_cfg, g["normal_v"],
                                   depth)
        ambient_access = fr._upsample_bilinear(access_half, band_h, W)
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
