"""G-buffer encode/decode.

Explicit 4-MRT representation matching /root/reference/Shaders/GBuffer.hlsl:
GB0 = (posW, metalness), GB1 = (albedo, roughness), GB2 = (normalW, 1),
GB3 = 0 (:22-31); decode renormalizes the normal (:33-43).

The fused pipeline (passes.frame.resolve_gbuffer) keeps these channels as a
dict and never materializes the MRTs — XLA fuses the encode into its
consumers — but the explicit arrays are available for tooling, G-buffer
dumps and image comparison against the reference's RGBA32F targets.
"""
from __future__ import annotations

import jax.numpy as jnp


def encode(pos_w, metalness, albedo, roughness, normal_w):
    """-> (gb0, gb1, gb2, gb3), each (H, W, 4) float32."""
    gb0 = jnp.concatenate([pos_w, metalness], axis=-1)
    gb1 = jnp.concatenate([albedo[..., :3], roughness], axis=-1)
    gb2 = jnp.concatenate([normal_w, jnp.ones_like(metalness)], axis=-1)
    gb3 = jnp.zeros_like(gb0)
    return gb0, gb1, gb2, gb3


def decode(gb0, gb1, gb2, gb3):
    """-> dict(pos_w, metalness, albedo, roughness, normal_w[normalized])."""
    n = gb2[..., :3]
    n = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-20)
    return dict(
        pos_w=gb0[..., :3],
        metalness=gb0[..., 3:4],
        albedo=gb1[..., :3],
        roughness=gb1[..., 3:4],
        normal_w=n,
        shininess_alpha=gb2[..., 3:4],
    )


def from_resolve(g: dict):
    """Pack the fused pipeline's resolve output into the reference's MRTs."""
    return encode(g["pos_w"], g["metalness"], g["albedo"], g["roughness"],
                  g["normal_w"])
