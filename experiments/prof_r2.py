"""Round-2 staged + fused profile on the real TPU (config 5)."""
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


def t(fn, *args, reps=3):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    g = jax.jit(scalarized)
    _ = float(g(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    scene, cfg, lights = config5_full_scene()
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width
    S = cfgr.shadow_map_size

    # dispatch floor: a trivial jit
    def nop(x):
        return x * 2.0
    xsmall = jnp.ones((8, 128))
    print(f"dispatch_floor       {t(nop, xsmall):8.2f} ms", flush=True)

    tris_m, tri_attr = fr.main_view_tris(sc, consts, cfgr)

    def vertex(s, c):
        return fr.main_view_tris(s, c, cfgr)
    print(f"vertex+setup         {t(vertex, sc, consts):8.2f} ms", flush=True)

    def raster_main(tr):
        return rp.rasterize_pallas(tr, W, H, cfgr.pair_capacity)
    print(f"raster_main          {t(raster_main, tris_m):8.2f} ms",
          flush=True)
    depth, tid = jax.jit(raster_main)(tris_m)
    tris_m = tris_m._replace(xy=rp.snap_xy(tris_m.xy))

    def shadow(s, c):
        return fr.render_shadow_maps(s, c, cfgr)
    print(f"shadow_maps          {t(shadow, sc, consts):8.2f} ms", flush=True)
    shadow_maps = jax.jit(shadow)(sc, consts)

    def resolve(s, c, tr, d, ti, ta):
        return fr.resolve_gbuffer(s, c, cfg=cfgr, tris=tr, depth=d, tid=ti,
                                  tri_attr=ta)
    print(f"resolve_gbuffer      "
          f"{t(resolve, sc, consts, tris_m, depth, tid, tri_attr):8.2f} ms",
          flush=True)
    g = jax.jit(functools.partial(fr.resolve_gbuffer, cfg=cfgr))(
        sc, consts, tris=tris_m, depth=depth, tid=tid, tri_attr=tri_attr)

    def swin_build(sm):
        return shadows.superwindow_maps_u16(sm)
    print(f"swin_build           {t(swin_build, shadow_maps):8.2f} ms",
          flush=True)

    def pcf(sm, pw):
        return shadows.cascade_shadow_factor(
            sm, consts.shadow_transforms, pw, consts.eye_pos, S,
            deferred_blend_quirk=True)
    print(f"pcf_full(build+2x)   {t(pcf, shadow_maps, g['pos_w']):8.2f} ms",
          flush=True)

    def ssao(nv, d):
        return fr.ssao_pass(sc, consts, cfgr, nv, d)
    print(f"ssao                 {t(ssao, g['normal_v'], depth):8.2f} ms",
          flush=True)

    def light(s, c, gg, sm, amb):
        return fr.lighting_pass(s, c, cfgr, gg, sm, amb, depth)
    amb_half = jax.jit(ssao)(g["normal_v"], depth)
    amb = jax.jit(lambda a: fr._upsample_bilinear(a, H, W))(amb_half)
    print(f"lighting(incl pcf)   "
          f"{t(light, sc, consts, g, shadow_maps, amb):8.2f} ms", flush=True)

    full = functools.partial(fr.render_frame, cfg=cfgr)
    print(f"TOTAL_fused          {t(full, sc, consts):8.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
