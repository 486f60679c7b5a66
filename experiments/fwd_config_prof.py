"""Amortized per-stage decomposition of configs 1-3 (VERDICT r3 item 1:
PERF.md explains config 5 but not why the small configs miss 16 ms).

Times, per config: the fused frame, its front/resolve/lighting stages on
real intermediates, and full-frame variants that isolate the texture
sampling term (aniso_probes=2, trilinear, bilinear-only). All timings
amortized bench-style (20 back-to-back dispatches, read one scalar).

Run ON THE TPU: python experiments/fwd_config_prof.py [config ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import raster_pallas as rp
from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.passes import frame as fr


def amortized(fn, *args, n=20):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    g = jax.jit(scalarized)
    _ = float(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / n * 1e3


def profile_config(c):
    scene, cfg, lights = CONFIGS[c]()
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width
    print(f"== config {c}: {W}x{H} deferred={cfgr.deferred} "
          f"pair_cap={cfgr.pair_capacity}", flush=True)

    def full(sc, consts):
        return fr.render_frame(sc, consts, cfgr)

    t_full = amortized(full, sc, consts)
    print(f"  full frame                {t_full:8.2f} ms", flush=True)

    # stages on real intermediates
    @jax.jit
    def front(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        depth, tid = rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)
        return tris, tri_attr, depth, tid

    tris, tri_attr, depth, tid = jax.block_until_ready(front(sc, consts))
    t_front = amortized(front, sc, consts)

    # front sub-split: geometry (vertex+clip+setup) vs bin+raster
    def geom(sc, consts):
        return fr.main_view_tris(sc, consts, cfgr)

    t_geom = amortized(geom, sc, consts)

    def rast(tris):
        return rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)

    t_rast = amortized(rast, tris)

    def resolve(sc, consts, tris, depth, tid, tri_attr):
        return fr.resolve_gbuffer(sc, consts, cfgr, tris, depth, tid,
                                  tri_attr)

    t_resolve = amortized(resolve, sc, consts, tris, depth, tid, tri_attr)
    g = jax.block_until_ready(jax.jit(resolve)(sc, consts, tris, depth,
                                               tid, tri_attr))

    shadow_maps = jnp.ones((cfgr.num_cascades, 2, 2), jnp.float32)
    access = jnp.ones((H, W), jnp.float32)

    def light(sc, consts, g):
        return fr.lighting_pass(sc, consts, cfgr, g, shadow_maps, access,
                                depth)

    t_light = amortized(light, sc, consts, g)
    print(f"  front (geom {t_geom:5.2f} + raster {t_rast:5.2f})"
          f"          {t_front:8.2f} ms", flush=True)
    print(f"  resolve (records+tex+math) {t_resolve:7.2f} ms", flush=True)
    print(f"  lighting+sky              {t_light:8.2f} ms", flush=True)
    print(f"  sum stages                {t_front + t_resolve + t_light:8.2f}"
          f" ms", flush=True)

    # texture-term isolation: full frame with cheaper sampling
    for label, probes, aniso in (("aniso2", 2, 8), ("trilinear", 4, 1)):
        cfgv = dataclasses.replace(cfgr, aniso_probes=probes,
                                   anisotropy=aniso)

        def fullv(sc, consts):
            return fr.render_frame(sc, consts, cfgv)

        t = amortized(fullv, sc, consts)
        print(f"  full[{label:9s}]          {t:8.2f} ms", flush=True)

    # resolve with the record gather short-circuited (constant records):
    # bounds the record-gather term
    def resolve_norec(sc, consts, tris, depth, tid, tri_attr):
        z = jnp.zeros_like(tid)
        return fr.resolve_gbuffer(sc, consts, cfgr, tris, depth, z,
                                  tri_attr)

    t_res_row0 = amortized(resolve_norec, sc, consts, tris, depth, tid,
                           tri_attr)
    print(f"  resolve[tid=0 everywhere] {t_res_row0:8.2f} ms", flush=True)


def main():
    args = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    for c in args:
        profile_config(c)


if __name__ == "__main__":
    main()
