"""Amortized per-stage profile of the real config-5 frame.

The round 2-3 per-pass attributions came from SINGLE-dispatch staged
timings minus an assumed ~29 ms round trip. dispatch_calib measured the
amortized dispatch floor at ~2.8 ms and found synthetic versions of the
frame's gathers far cheaper than their staged attributions (record gather
7 ms vs "31", PCF windows 29.7 vs "53"). This profiler times the REAL
stages on REAL frame intermediates, bench-style (20 back-to-back
dispatches, read one scalar), so staged-vs-fused serialization and
attribution errors become visible:

  sum(stages) ~ fused  -> attributions were inflated by the round trip;
                          per-stage numbers here are the truth;
  sum(stages) << fused -> the fused program serializes something the
                          staged runs don't (the PCF-split effect).

Run ON THE TPU: python -m experiments.amortized_stage_prof
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import config5_full_scene
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import shadows
from crychic_renderer_tpu.ops import raster_pallas as rp
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


def main():
    scene, cfg, lights = config5_full_scene()
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width

    # materialize real intermediates once
    alpha_on = cfgr.alpha_test_enabled and sc.alpha is not None

    @jax.jit
    def front(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        depth, tid = rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)
        if alpha_on:
            depth, tid, tris, tri_attr = fr.alpha_merge_main(
                sc, consts, cfgr, depth, tid, tris, tri_attr)
        return tris, tri_attr, depth, tid

    tris, tri_attr, depth, tid = jax.block_until_ready(front(sc, consts))

    @jax.jit
    def mk_g(sc, consts, tris, depth, tid, tri_attr):
        return fr.resolve_gbuffer(sc, consts, cfgr, tris, depth, tid,
                                  tri_attr)

    g = jax.block_until_ready(mk_g(sc, consts, tris, depth, tid, tri_attr))

    @jax.jit
    def mk_atlas(sc, consts):
        sm = fr.render_shadow_maps(sc, consts, cfgr)
        if alpha_on:
            sm = fr.alpha_merge_shadow(sc, consts, cfgr, sm)
        return sm

    shadow_maps = jax.block_until_ready(mk_atlas(sc, consts))

    t_front = amortized(front, sc, consts)
    t_resolve = amortized(mk_g, sc, consts, tris, depth, tid, tri_attr)
    t_atlas = amortized(mk_atlas, sc, consts)

    def ssao(sc, consts, nv, depth, tid):
        return fr.ssao_pass(sc, consts, cfgr, nv, depth, valid=tid >= 0)

    t_ssao = amortized(ssao, sc, consts, g["normal_v"], depth, tid)

    def pcf(sm, consts, pos_w, valid):
        def sf_fn(pw, dd):
            return shadows.cascade_shadow_factor(
                sm, consts.shadow_transforms, pw, consts.eye_pos,
                cfgr.shadow_map_size, deferred_blend_quirk=cfgr.deferred,
                dead=dd)
        if cfgr.shade_tile_capacity:
            return fr._pcf_factor_compacted(cfgr, pos_w, valid, sf_fn)
        return sf_fn(pos_w, ~valid)

    t_pcf = amortized(pcf, shadow_maps, consts, g["pos_w"], tid >= 0)

    @jax.jit
    def mk_access(sc, consts, nv, depth, tid):
        return fr._upsample_bilinear(
            fr.ssao_pass(sc, consts, cfgr, nv, depth, valid=tid >= 0),
            H, W)

    access = jax.block_until_ready(
        mk_access(sc, consts, g["normal_v"], depth, tid))

    def light(sc, consts, g, sm, access, depth):
        return fr.lighting_pass(sc, consts, cfgr, g, sm, access, depth)

    t_light = amortized(light, sc, consts, g, shadow_maps, access, depth)

    def full(sc, consts):
        return fr.render_frame(sc, consts, cfgr)

    t_full = amortized(full, sc, consts)

    # lighting minus its internal PCF (staged separately above): pass a
    # precomputed shadow factor
    sf = jax.block_until_ready(jax.jit(pcf)(shadow_maps, consts,
                                        g["pos_w"], tid >= 0))

    def light_nopcf(sc, consts, g, sm, access, depth, sf):
        return fr.lighting_pass(sc, consts, cfgr, g, sm, access, depth,
                                shadow_factor=sf)

    t_light_nopcf = amortized(light_nopcf, sc, consts, g, shadow_maps,
                              access, depth, sf)

    rows = [
        ("front (vertex+clip+setup+bin+raster+alpha)", t_front),
        ("resolve_gbuffer (records+aniso+math)", t_resolve),
        ("shadow atlas (4 casc + alpha punch)", t_atlas),
        ("ssao (occlusion+3 blurs)", t_ssao),
        ("pcf factor (isolated)", t_pcf),
        ("lighting incl. PCF", t_light),
        ("lighting with precomputed sf", t_light_nopcf),
        ("SUM front+resolve+atlas+ssao+lighting",
         t_front + t_resolve + t_atlas + t_ssao + t_light),
        ("FULL fused render_frame", t_full),
    ]
    for name, ms in rows:
        print(f"{name:46s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
