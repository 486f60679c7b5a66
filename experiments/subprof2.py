"""Compare old-vs-new hot paths after the streaming-kernel + PCF-kernel
changes: main raster, shadow atlas, PCF XLA vs Pallas."""
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
    print("caps:", r.capacity_requirements(0.0), "shadow_cap",
          cfgr.shadow_pair_capacity, flush=True)

    tris_m, tri_attr = fr.main_view_tris(sc, consts, cfgr)

    def raster_main(tr):
        return rp.rasterize_pallas(tr, W, H, cfgr.pair_capacity)

    print(f"raster_main(stream)  {t(raster_main, tris_m):8.2f} ms",
          flush=True)
    depth, tid = jax.jit(raster_main)(tris_m)
    tris_m = tris_m._replace(xy=rp.snap_xy(tris_m.xy))

    def shadow(s, c):
        return fr.render_shadow_maps(s, c, cfgr)

    print(f"shadow_maps(stream8) {t(shadow, sc, consts):8.2f} ms",
          flush=True)
    shadow_maps = jax.jit(shadow)(sc, consts)

    g = jax.jit(functools.partial(fr.resolve_gbuffer, cfg=cfgr))(
        sc, consts, tris=tris_m, depth=depth, tid=tid, tri_attr=tri_attr)

    def pcf(use_kernel):
        def f(sm, pw, vm):
            return shadows.cascade_shadow_factor(
                sm, consts.shadow_transforms, pw, consts.eye_pos, S,
                deferred_blend_quirk=True, use_kernel=use_kernel,
                valid_mask=vm)
        return f

    print(f"pcf_xla              "
          f"{t(pcf(False), shadow_maps, g['pos_w'], g['valid']):8.2f} ms",
          flush=True)
    print(f"pcf_kernel           "
          f"{t(pcf(True), shadow_maps, g['pos_w'], g['valid']):8.2f} ms",
          flush=True)

    full = jax.jit(functools.partial(fr.render_frame, cfg=cfgr))
    print(f"TOTAL_fused          {t(full, sc, consts):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
