"""Near-plane triangle clipping.

D3D clips primitives against 0 <= z <= w in clip space; the consequential
plane for a renderer is the near plane z = 0 (triangles crossing it blow
up under perspective divide — the reference gets this clipping from
fixed-function hardware). This module clips in homogeneous clip space
against z >= 0 with static shapes: every input triangle yields exactly two
output slots (main + extra), each valid or not:

  - all 3 vertices in front  -> (original, invalid)
  - 2 in front (quad case)   -> (tri A-B-J, tri A-J-I)
  - 1 in front               -> (tri A-I-K, invalid)
  - none                     -> (invalid, invalid)

Clipped vertices interpolate the full per-vertex record (clip position +
world-space attributes) linearly in clip space — the correct interpolation
domain for rasterization. Note z >= 0 implies w >= near > 0 afterwards, so
the rasterizer's w>0 guard never fires for clipped output.

Everything is dense vectorized selects (no data-dependent shapes): the
case dispatch rotates each triangle into a canonical layout using a
bitmask lookup.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# per inside-bitmask (bit i = vertex i inside): rotation r (new0 = old_r)
# and case id (0 drop, 1 one-inside, 2 two-inside, 3 keep)
_ROT = np.array([0, 0, 1, 0, 2, 1, 1, 0], dtype=np.int32)
_CASE = np.array([0, 1, 1, 2, 1, 2, 2, 3], dtype=np.int32)


def clip_near(tri_attr: jnp.ndarray, valid_in: jnp.ndarray):
    """tri_attr: (T, 3, C) with [..., :4] = clip-space position (z at
    index 2). valid_in: (T,) bool. Returns (out (2T, 3, C), valid (2T,)).
    """
    z = tri_attr[..., 2]
    inside = z >= 0.0
    bits = (inside[:, 0].astype(jnp.int32)
            + 2 * inside[:, 1].astype(jnp.int32)
            + 4 * inside[:, 2].astype(jnp.int32))
    rot = jnp.asarray(_ROT)[bits]
    case = jnp.asarray(_CASE)[bits]

    # rotate: new_i = old_(i + rot) % 3
    r1 = tri_attr[:, [1, 2, 0], :]
    r2 = tri_attr[:, [2, 0, 1], :]
    rt = jnp.where((rot == 1)[:, None, None], r1,
                   jnp.where((rot == 2)[:, None, None], r2, tri_attr))
    A, B, C = rt[:, 0], rt[:, 1], rt[:, 2]
    zA, zB, zC = A[..., 2], B[..., 2], C[..., 2]

    def lerp(p, q, zp, zq):
        t = zp / jnp.where(zp == zq, 1.0, zp - zq)
        return p + t[:, None] * (q - p)

    # two-inside (canonical: C out): crossings on A->C and B->C
    I = lerp(A, C, zA, zC)
    J = lerp(B, C, zB, zC)
    # one-inside (canonical: A in): crossings on A->B and A->C
    Ib = lerp(A, B, zA, zB)
    Kb = lerp(A, C, zA, zC)

    is_keep = (case == 3)[:, None, None]
    is_two = (case == 2)[:, None, None]
    is_one = (case == 1)[:, None, None]

    main = jnp.where(
        is_keep, rt,
        jnp.where(is_two, jnp.stack([A, B, J], axis=1),
                  jnp.stack([A, Ib, Kb], axis=1)))
    extra = jnp.stack([A, J, I], axis=1)

    valid_main = valid_in & (case != 0)
    valid_extra = valid_in & (case == 2)
    out = jnp.concatenate([main, extra], axis=0)
    valid = jnp.concatenate([valid_main, valid_extra], axis=0)
    return out, valid
