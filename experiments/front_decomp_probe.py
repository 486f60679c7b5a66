"""Decompose the 23 ms front end (vertex + clip + setup + bin + raster)
of the config-5 frame, amortized. Which sub-stage holds the cost?

Run ON THE TPU: python -m experiments.front_decomp_probe
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
from crychic_renderer_tpu.ops import clipping, rasterizer as rz
from crychic_renderer_tpu.ops import raster_pallas as rp
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
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width

    def vstage(sc, consts):
        return fr.vertex_stage(sc.opaque, consts.opaque_visibility,
                               consts.view_proj, sc.mat_transform)

    t_v = amortized(vstage, sc, consts)

    vs = jax.block_until_ready(jax.jit(vstage)(sc, consts))
    pos_w, nrm_w, tan_w, uv, clip = vs

    def attrs(sc, pos_w, nrm_w, tan_w, uv, clip):
        return fr.build_tri_attrs(sc.opaque, pos_w, nrm_w, tan_w, uv, clip)

    t_a = amortized(attrs, sc, *vs)
    ta0 = jax.block_until_ready(jax.jit(attrs)(sc, *vs))

    def clipn(ta):
        return clipping.clip_near(ta, jnp.ones(ta.shape[0], bool))

    t_c = amortized(clipn, ta0)
    ta, tv = jax.block_until_ready(jax.jit(clipn)(ta0))

    def setup(ta, tv):
        return rz.setup_tri_verts(ta[..., :4], tv, W, H)

    t_s = amortized(setup, ta, tv)
    tris = jax.block_until_ready(jax.jit(setup)(ta, tv))

    def binb(tris):
        return rz.bin_triangles(tris, W, H, cfgr.pair_capacity,
                                tile_h=rp.TILE_H, tile_w=rp.TILE_W)

    t_b = amortized(binb, tris)

    def rast(tris):
        return rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)

    t_r = amortized(rast, tris)

    def full(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        return rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)

    t_f = amortized(full, sc, consts)
    V = sc.opaque.positions.shape[0]
    T = ta0.shape[0]
    print(f"V={V} T={T}", flush=True)
    print(f"vertex {t_v:6.2f} | tri_attrs {t_a:6.2f} | clip {t_c:6.2f} | "
          f"setup {t_s:6.2f} | bin {t_b:6.2f} | bin+raster {t_r:6.2f} | "
          f"full front {t_f:6.2f}", flush=True)


if __name__ == "__main__":
    main()
