"""Texture sampling: mip-pyramid pool, bilinear/trilinear 2D sampling,
cubemap sampling.

Replaces the D3D12 sampler hardware used by the reference's shaders
(gsamAnisotropicWrap / gsamLinearClamp / gsamLinearWrap, static samplers at
/root/reference/CRYCHIC.cpp:2601). TPUs sample via gathers, so all textures
are packed into ONE flat float32 pool in HBM with an (ntex, nmips) offset
table; a sample is 4 gathers (bilinear) or 8 (trilinear) from the pool.

Note on filtering parity: the reference samples diffuse/normal maps with
anisotropic filtering; we implement trilinear (isotropic footprint). This
is a deliberate quality trade documented for image comparison (differences
concentrate at grazing angles).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

WRAP = 0
CLAMP = 1


@dataclasses.dataclass
class TexturePool:
    """Device-side texture pool.

    data: (P, 4) uint32 — for each texel, its 2x2 WRAP-addressed
    neighborhood quad [(x,y), (x+1,y), (x,y+1), (x+1,y+1)], each RGBA8
    packed (r | g<<8 | b<<16 | a<<24). TPU gathers cost ~constant latency
    per ROW regardless of width, so one 16-byte quad row per bilinear
    sample beats four scalar texel fetches 4x; the 4x data duplication is
    a few MB for this asset set.
    offset: (N, L) int32 flat row offset of each (texture, mip); dims
    (N, L, 2) int32 = (w, h). mips beyond a texture's chain repeat its
    last level. num_mips: (N,) int32.
    """

    data: jnp.ndarray
    offset: jnp.ndarray
    dims: jnp.ndarray
    num_mips: jnp.ndarray

    @staticmethod
    def build(textures) -> "TexturePool":
        """textures: list of per-texture mip lists, each (H, W, 4) uint8."""
        max_mips = max(len(t) for t in textures)
        chunks, offsets, dims, counts = [], [], [], []
        pos = 0
        for mips in textures:
            offs, dms = [], []
            for level in range(max_mips):
                img = mips[min(level, len(mips) - 1)]
                h, w = img.shape[:2]
                if level < len(mips):
                    u = img.astype(np.uint32)
                    packed = (u[..., 0] | (u[..., 1] << 8)
                              | (u[..., 2] << 16) | (u[..., 3] << 24))
                    xp = np.roll(packed, -1, axis=1)  # x+1, wrap
                    yp = np.roll(packed, -1, axis=0)  # y+1, wrap
                    xyp = np.roll(xp, -1, axis=0)
                    quad = np.stack([packed, xp, yp, xyp], axis=-1)
                    chunks.append(quad.reshape(-1, 4))
                    off = pos
                    pos += h * w
                    last_off = off
                else:
                    off = last_off  # reuse the last real level
                offs.append(off)
                dms.append((w, h))
            offsets.append(offs)
            dims.append(dms)
            counts.append(len(mips))
        data = np.concatenate(chunks, axis=0)
        return TexturePool(
            data=jnp.asarray(data),
            offset=jnp.asarray(np.array(offsets, np.int32)),
            dims=jnp.asarray(np.array(dims, np.int32)),
            num_mips=jnp.asarray(np.array(counts, np.int32)),
        )


def unpack_rgba8(packed: jnp.ndarray) -> jnp.ndarray:
    """(…,) uint32 -> (…, 4) float32 in [0, 1]."""
    p = packed
    r = (p & 0xFF).astype(jnp.float32)
    g = ((p >> 8) & 0xFF).astype(jnp.float32)
    b = ((p >> 16) & 0xFF).astype(jnp.float32)
    a = ((p >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=-1) * (1.0 / 255.0)


def _wrap_coord(i, n, mode):
    if mode == WRAP:
        return jnp.remainder(i, n)
    return jnp.clip(i, 0, n - 1)


def sample_bilinear(pool: TexturePool, tex: jnp.ndarray, uv: jnp.ndarray,
                    mip: jnp.ndarray, mode: int = WRAP) -> jnp.ndarray:
    """tex: (...,) int32; uv: (..., 2); mip: (...,) int32 -> (..., 4).

    One quad-row gather per sample (see TexturePool). The pool bakes WRAP
    addressing for the +1 neighbors (the reference samples material
    textures with the Wrap samplers); mode only affects the base texel.
    """
    w = pool.dims[tex, mip, 0].astype(jnp.float32)
    h = pool.dims[tex, mip, 1].astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    wi = pool.dims[tex, mip, 0]
    hi = pool.dims[tex, mip, 1]
    xa = _wrap_coord(x0.astype(jnp.int32), wi, mode)
    ya = _wrap_coord(y0.astype(jnp.int32), hi, mode)
    off = pool.offset[tex, mip]
    quad = pool.data[off + ya * wi + xa]  # (..., 4) u32 — ONE gather
    c00 = unpack_rgba8(quad[..., 0])
    c10 = unpack_rgba8(quad[..., 1])
    c01 = unpack_rgba8(quad[..., 2])
    c11 = unpack_rgba8(quad[..., 3])
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_trilinear(pool: TexturePool, tex: jnp.ndarray, uv: jnp.ndarray,
                     lod: jnp.ndarray, mode: int = WRAP) -> jnp.ndarray:
    """lod: (...,) float32 mip level (will be clamped per texture)."""
    max_mip = (pool.num_mips[tex] - 1).astype(jnp.float32)
    lod = jnp.clip(lod, 0.0, max_mip)
    m0 = jnp.floor(lod).astype(jnp.int32)
    m1 = jnp.minimum(m0 + 1, max_mip.astype(jnp.int32))
    f = (lod - m0.astype(jnp.float32))[..., None]
    a = sample_bilinear(pool, tex, uv, m0, mode)
    b = sample_bilinear(pool, tex, uv, m1, mode)
    return a * (1 - f) + b * f


def compute_lod(uv: jnp.ndarray, tex: jnp.ndarray, pool: TexturePool) -> jnp.ndarray:
    """Screen-space mip selection from finite differences of a (H, W, 2) uv
    image — the software analogue of pixel-quad derivatives. Edges reuse
    their neighbor's derivative (like HW helper lanes)."""
    w0 = pool.dims[tex, 0, 0].astype(jnp.float32)
    h0 = pool.dims[tex, 0, 1].astype(jnp.float32)
    st = uv * jnp.stack([w0, h0], axis=-1)
    dx = jnp.diff(st, axis=1, append=st[:, -1:, :])
    dx = dx.at[:, -1, :].set(dx[:, -2, :])
    dy = jnp.diff(st, axis=0, append=st[-1:, :, :])
    dy = dy.at[-1, :, :].set(dy[-2, :, :])
    rho = jnp.maximum(
        jnp.sqrt((dx * dx).sum(-1)), jnp.sqrt((dy * dy).sum(-1))
    )
    return jnp.log2(jnp.maximum(rho, 1e-8))


# ---------------------------------------------------------------------------
# Cubemap
# ---------------------------------------------------------------------------

def pack_cubemap(faces: np.ndarray) -> np.ndarray:
    """(6, S, S, 4) float [0,1] -> (6, S, S, 4) uint32: per texel, the
    clamp-addressed 2x2 neighborhood quad, RGBA8-packed — one row gather
    per bilinear cubemap sample."""
    u = np.clip(np.asarray(faces) * 255.0 + 0.5, 0, 255).astype(np.uint32)
    packed = (u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
              | (u[..., 3] << 24))  # (6, S, S)
    xp = packed[:, :, np.minimum(np.arange(packed.shape[2]) + 1,
                                 packed.shape[2] - 1)]
    yp = packed[:, np.minimum(np.arange(packed.shape[1]) + 1,
                              packed.shape[1] - 1), :]
    xyp = yp[:, :, np.minimum(np.arange(packed.shape[2]) + 1,
                              packed.shape[2] - 1)]
    return np.stack([packed, xp, yp, xyp], axis=-1)


def sample_cubemap(faces: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """faces: (6, S, S) uint32 RGBA8-packed in D3D face order
    (+X -X +Y -Y +Z -Z); direction: (..., 3). Bilinear within the face,
    edges clamped."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # major axis selection (D3D TextureCube convention)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)
    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    sc = jnp.where(
        is_x, jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)

    S = faces.shape[1]
    fx = u * S - 0.5
    fy = v * S - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, S - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, S - 1)
    quad = faces[face, y0i, x0i]  # (..., 4) u32 — ONE gather
    c00 = unpack_rgba8(quad[..., 0])
    c10 = unpack_rgba8(quad[..., 1])
    c01 = unpack_rgba8(quad[..., 2])
    c11 = unpack_rgba8(quad[..., 3])
    top = c00 * (1 - wx) + c10 * wx
    bot = c01 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def procedural_sky_cubemap(size: int = 256) -> np.ndarray:
    """Substitute for the missing snowcube1024.dds asset
    (LoadTextures requests it, CRYCHIC.cpp:960, but the repo ships no
    cubemap — SURVEY.md §0). A horizon-graded sky: deep blue zenith,
    pale horizon, dark ground."""
    S = size
    faces = np.zeros((6, S, S, 4), dtype=np.float32)
    uv = (np.arange(S, dtype=np.float32) + 0.5) / S * 2.0 - 1.0
    u, v = np.meshgrid(uv, uv, indexing="xy")
    dirs = {
        0: lambda u, v: np.stack([np.ones_like(u), -v, -u], -1),
        1: lambda u, v: np.stack([-np.ones_like(u), -v, u], -1),
        2: lambda u, v: np.stack([u, np.ones_like(u), v], -1),
        3: lambda u, v: np.stack([u, -np.ones_like(u), -v], -1),
        4: lambda u, v: np.stack([u, -v, np.ones_like(u)], -1),
        5: lambda u, v: np.stack([-u, -v, -np.ones_like(u)], -1),
    }
    zenith = np.array([0.18, 0.32, 0.65])
    horizon = np.array([0.82, 0.88, 0.95])
    ground = np.array([0.35, 0.33, 0.30])
    for f in range(6):
        d = dirs[f](u, v)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        h = d[..., 1]
        t = np.clip(h, 0.0, 1.0) ** 0.6
        sky = horizon * (1 - t[..., None]) + zenith * t[..., None]
        g = np.clip(-h, 0.0, 1.0) ** 0.5
        col = sky * (1 - g[..., None]) + ground * g[..., None]
        faces[f, ..., :3] = col
        faces[f, ..., 3] = 1.0
    return faces
