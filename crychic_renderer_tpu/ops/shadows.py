"""Cascaded shadow lookup: 16-tap rotated-Poisson PCF with a bilinear
comparison sampler, cascade selection by view distance, cross-cascade blend.

Re-implements /root/reference/Shaders/Common.hlsl:135-316 (CalcShadowFactor,
CalcCascadeShadowFactorWithPoisson and friends) and the cascade-selection
loops of Default.hlsl:124-149 (forward) / DeferredShading.hlsl:53-76
(deferred). The shadow sampler is D3D comparison LESS_EQUAL with linear
filtering and OPAQUE_BLACK border (CRYCHIC.cpp:2649-2658): each tap
bilinearly blends four per-texel (pixel_depth <= texel_depth) results, and
taps outside the map compare against 0 (always shadowed).

Deferred-path quirk replicated: the blend condition
``abs(distance - radius[j] < 5.0f)`` (DeferredShading.hlsl:60) casts the
comparison to bool before abs, so the deferred shader ALWAYS blends
cascades j and j+1.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.cascades import CASCADE_RADII

# Poisson disk (Common.hlsl:173-183).
POISSON_DISK = np.array(
    [
        [-0.94201624, -0.39906216], [0.94558609, -0.76890725],
        [-0.094184101, -0.92938870], [0.34495938, 0.29387760],
        [-0.91588581, 0.45771432], [-0.81544232, -0.87912464],
        [-0.38277543, 0.27676845], [0.97484398, 0.75648379],
        [0.44323325, -0.97511554], [0.53742981, -0.47373420],
        [-0.26496911, -0.41893023], [0.79197514, 0.19090188],
        [-0.24188840, 0.99706507], [-0.81409955, 0.91437590],
        [0.19984126, 0.78641367], [0.14383161, -0.14100790],
    ],
    dtype=np.float32,
)
N_SAMPLE = 16


def nrand(uv):
    """Common.hlsl:167-171 hash (the float2 collapses to one scalar)."""
    s = jnp.sin(uv[..., 0] * (12.9898 * 2.0) + uv[..., 1] * (78.233 * 2.0))
    v = s * 43758.5453
    return jnp.abs(v - jnp.floor(v))


def _cmp_sample_bilinear(shadow_maps, cascade, u, v, depth):
    """One SampleCmpLevelZero tap: bilinear blend of (depth <= texel) with
    black-border behavior outside [0,1]^2.

    shadow_maps: (C, S, S); cascade/u/v/depth: (...,).
    """
    S = shadow_maps.shape[1]
    x = u * S - 0.5
    y = v * S - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def texel(cx, cy):
        inb = (cx >= 0) & (cx < S) & (cy >= 0) & (cy < S)
        cxx = jnp.clip(cx, 0, S - 1)
        cyy = jnp.clip(cy, 0, S - 1)
        d = shadow_maps[cascade, cyy, cxx]
        d = jnp.where(inb, d, 0.0)  # border = opaque black (depth 0)
        return (depth <= d).astype(jnp.float32)

    c00 = texel(x0i, y0i)
    c10 = texel(x0i + 1, y0i)
    c01 = texel(x0i, y0i + 1)
    c11 = texel(x0i + 1, y0i + 1)
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def poisson_pcf(shadow_maps, cascade, shadow_pos, smap_size: int):
    """CalcCascadeShadowFactorWithPoisson (Common.hlsl:263-316).

    shadow_pos: (..., 4) homogeneous position in shadow-texture space
    (world @ shadow_transform, pre-divide). cascade: (...,) int32.
    """
    inv_w = 1.0 / jnp.maximum(shadow_pos[..., 3], 1e-20)
    uvz = shadow_pos[..., :3] * inv_w[..., None]
    u, v, depth = uvz[..., 0], uvz[..., 1], uvz[..., 2]

    theta = nrand(uvz[..., :2])
    c, s = jnp.cos(theta), jnp.sin(theta)
    radius = 5.0 / smap_size / 2.0

    lit = jnp.zeros_like(u)
    for i in range(N_SAMPLE):
        px, py = POISSON_DISK[i]
        # mul(p, R) with R = [[c, s], [-s, c]] (row-vector)
        ox = (px * c - py * s) * radius
        oy = (px * s + py * c) * radius
        lit = lit + _cmp_sample_bilinear(shadow_maps, cascade, u + ox, v + oy,
                                         depth)
    return lit / N_SAMPLE


def poisson_pcf_windowed(shadow_maps, cascade, shadow_pos, smap_size: int):
    """Windowed formulation of the 16-tap rotated-Poisson PCF.

    Mathematically identical to `poisson_pcf`: the search radius is 2.5
    texels (Common.hlsl:305), so every tap's bilinear footprint lies in an
    8x8-texel window around the receiver. One sliced gather fetches the
    window; the 16 taps' bilinear weights are accumulated into a single
    8x8 mask and combined with the window's depth comparisons in one fused
    elementwise reduction — O(1) gathers per pixel instead of 64.

    Border approximation: the window origin clamps to the map, so taps that
    would read the black border instead read edge texels. Cascade fitting
    keeps receivers inside the map, making this unreachable in practice.
    """
    S = shadow_maps.shape[1]
    inv_w = 1.0 / jnp.maximum(shadow_pos[..., 3], 1e-20)
    uvz = shadow_pos[..., :3] * inv_w[..., None]
    u, v, depth = uvz[..., 0], uvz[..., 1], uvz[..., 2]

    cx = u * S - 0.5
    cy = v * S - 0.5
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    ox = jnp.clip(x0.astype(jnp.int32) - 3, 0, S - 8)
    oy = jnp.clip(y0.astype(jnp.int32) - 3, 0, S - 8)

    shape = u.shape
    n = int(np.prod(shape))
    starts = jnp.stack([cascade.reshape(n), oy.reshape(n), ox.reshape(n)],
                       axis=-1)
    window = jax.lax.gather(
        shadow_maps, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2)),
        slice_sizes=(1, 8, 8), mode="clip")  # (n, 8, 8)
    window = window.reshape(shape + (8, 8))

    cmp = (depth[..., None, None] <= window).astype(jnp.float32)

    theta = nrand(uvz[..., :2])
    c, sn = jnp.cos(theta), jnp.sin(theta)
    radius = 5.0 / smap_size / 2.0 * S  # tap offsets in texels (= 2.5)

    # accumulate the 16 taps' bilinear weights into one 8x8 mask
    k = jnp.arange(8, dtype=jnp.float32)
    W = jnp.zeros(shape + (8, 8), jnp.float32)
    fx_base = cx - ox.astype(jnp.float32)
    fy_base = cy - oy.astype(jnp.float32)
    for i in range(N_SAMPLE):
        pxd, pyd = POISSON_DISK[i]
        tx = fx_base + (pxd * c - pyd * sn) * radius  # window-local coords
        ty = fy_base + (pxd * sn + pyd * c) * radius
        tx0 = jnp.floor(tx)
        ty0 = jnp.floor(ty)
        fx = tx - tx0
        fy = ty - ty0
        wx = (jnp.where(k == tx0[..., None], 1.0 - fx[..., None], 0.0)
              + jnp.where(k == tx0[..., None] + 1.0, fx[..., None], 0.0))
        wy = (jnp.where(k == ty0[..., None], 1.0 - fy[..., None], 0.0)
              + jnp.where(k == ty0[..., None] + 1.0, fy[..., None], 0.0))
        W = W + wy[..., :, None] * wx[..., None, :]

    return (cmp * W).sum(axis=(-1, -2)) / N_SAMPLE


def cascade_shadow_factor(shadow_maps, shadow_transforms, pos_w, eye_pos,
                          smap_size: int, deferred_blend_quirk: bool):
    """Per-pixel cascade select + PCF + blend.

    shadow_maps: (4, S, S) depth; shadow_transforms: (4, 4, 4) row-vector
    world->uv/depth; pos_w: (..., 3); eye_pos: (3,).
    Forward path (Default.hlsl:124-149): blend only within 10 units of the
    cascade boundary. Deferred path quirk: always blend (see module doc).
    Distance >= 100 -> no shadow (factor 1).
    """
    radii = jnp.asarray(CASCADE_RADII)
    dist = jnp.sqrt(((eye_pos - pos_w) ** 2).sum(-1))
    # first cascade whose radius exceeds the distance; 4 = none
    past = (dist[..., None] >= radii[None, None, :]).sum(-1).astype(jnp.int32)
    c = jnp.clip(past, 0, 3)
    no_shadow = past >= 4

    ph = jnp.concatenate([pos_w, jnp.ones_like(pos_w[..., :1])], axis=-1)

    def shadow_pos_for(cascade_idx):
        # gather each pixel's shadow transform then apply: (...,4) @ (...,4,4)
        M = shadow_transforms[cascade_idx]  # (..., 4, 4)
        return jnp.einsum("...i,...ij->...j", ph, M)

    f_c = poisson_pcf_windowed(shadow_maps, c, shadow_pos_for(c), smap_size)
    c_next = jnp.minimum(c + 1, 3)
    f_n = poisson_pcf_windowed(shadow_maps, c_next, shadow_pos_for(c_next),
                               smap_size)

    if deferred_blend_quirk:
        blend = c < 3
    else:
        blend = (c < 3) & (jnp.abs(dist - radii[c]) < 10.0)
    factor = jnp.where(blend, 0.5 * (f_c + f_n), f_c)
    return jnp.where(no_shadow, 1.0, factor)
