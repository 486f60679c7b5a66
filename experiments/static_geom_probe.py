"""Validate the static-geometry front end: worlds / tex_transforms /
mat_transform are STATIC per scene (only mat_pair + visibility + camera
change per frame — app/renderer.py), so pos_w/nrm_w/tan_w/uv and the
vertex->triangle corner gather can be precomputed at scene build. The
per-frame front end reduces to a dense (T,3,4)@(4,4) clip FMA + one
per-triangle visibility gather from a tiny table + a concat.

Bit-exactness: rowmat is per-row, so transform-then-gather ==
gather-then-transform; a triangle's 3 corners share one instance, so the
per-triangle vis multiply equals the per-vertex one.

Run ON THE TPU: python -m experiments.static_geom_probe
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import config5_full_scene
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import shading
from crychic_renderer_tpu.passes import frame as fr


def amortized(fn, *args, n=20):
    g = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda s, l: s + jnp.sum(l.astype(jnp.float32)),
        fn(*a), jnp.float32(0)))
    _ = float(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    scene, cfg, lights = config5_full_scene()
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)

    # ---- legacy: vertex_stage + build_tri_attrs (the 14.7 ms pair) ----
    def legacy(sc, consts):
        pw, nw, tw, uv, cl = fr.vertex_stage(
            sc.opaque, consts.opaque_visibility, consts.view_proj,
            sc.mat_transform)
        return fr.build_tri_attrs(sc.opaque, pw, nw, tw, uv, cl)

    t_leg = amortized(legacy, sc, consts)
    ta_leg = np.asarray(jax.jit(legacy)(sc, consts))

    # ---- precompute statics (one-time, on device) ----
    draw = sc.opaque
    vis1 = jnp.ones_like(consts.opaque_visibility)

    def statics(draw, mat_transform):
        pw, nw, tw, uv, cl = fr.vertex_stage(
            draw, vis1, jnp.eye(4, dtype=jnp.float32), mat_transform)
        tri_idx = draw.indices.reshape(-1, 3)
        rest = jnp.concatenate(
            [pw, nw, tw, uv,
             draw.material_indices[draw.vertex_instance].astype(
                 jnp.float32)[:, None]], -1)[tri_idx]  # (T, 3, 12)
        poswh = jnp.concatenate(
            [pw, jnp.ones_like(pw[..., :1])], -1)[tri_idx]  # (T, 3, 4)
        tri_inst = draw.vertex_instance[tri_idx[:, 0]]
        return rest, poswh, tri_inst

    rest, poswh, tri_inst = jax.jit(statics)(draw, sc.mat_transform)
    rest = jax.block_until_ready(rest)

    # ---- fast path: dense clip FMA + tiny vis gather + concat ----
    def fast(rest, poswh, tri_inst, consts):
        clip = shading.rowmat(poswh, consts.view_proj)
        vis = consts.opaque_visibility[tri_inst]
        clip = clip * vis[:, None, None]
        return jnp.concatenate([clip, rest], -1)

    t_fast = amortized(fast, rest, poswh, tri_inst, consts)
    ta_fast = np.asarray(jax.jit(fast)(rest, poswh, tri_inst, consts))

    exact = np.array_equal(ta_leg, ta_fast)
    print(f"main view: legacy {t_leg:6.2f} ms | static {t_fast:6.2f} ms | "
          f"bit-exact {exact}", flush=True)
    if not exact:
        d = np.abs(ta_leg - ta_fast)
        print(f"  max |diff| {d.max():.3e} at {np.unravel_index(d.argmax(), d.shape)}")

    # ---- shadow_tri_world: legacy vs static ----
    def leg_sh(sc, consts):
        return fr.shadow_tri_world(sc.shadow, consts.shadow_visibility)

    t_lsh = amortized(leg_sh, sc, consts)
    tw_leg = np.asarray(jax.jit(leg_sh)(sc, consts))

    def sh_statics(draw):
        W = draw.worlds[draw.vertex_instance]
        ph = jnp.concatenate(
            [draw.positions, jnp.ones_like(draw.positions[..., :1])], -1)
        pos_w = shading.rowmat(ph, W)
        tri_idx = draw.indices.reshape(-1, 3)
        return pos_w[tri_idx], draw.vertex_instance[tri_idx[:, 0]]

    sposwh, stri_inst = jax.jit(sh_statics)(sc.shadow)
    sposwh = jax.block_until_ready(sposwh)

    def fast_sh(sposwh, stri_inst, consts):
        return sposwh * consts.shadow_visibility[stri_inst][:, None, None]

    t_fsh = amortized(fast_sh, sposwh, stri_inst, consts)
    tw_fast = np.asarray(jax.jit(fast_sh)(sposwh, stri_inst, consts))
    exact_sh = np.array_equal(tw_leg, tw_fast)
    print(f"shadow   : legacy {t_lsh:6.2f} ms | static {t_fsh:6.2f} ms | "
          f"bit-exact {exact_sh}", flush=True)


if __name__ == "__main__":
    main()
