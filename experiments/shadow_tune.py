"""Shadow-atlas kernel tuning (config 5): tile_h x TILES_PER_PROG scan,
plus full-frame timing of the documented fast preset
(fast_shadow_factor + ssao_scale 4 + aniso_probes 2)."""
import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import config5_full_scene
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import rasterizer as rz
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
    S = cfgr.shadow_map_size

    def shadow_tris(s, c):
        tw = fr.shadow_tri_world(s.shadow, c.shadow_visibility)
        tl = []
        for ci in range(4):
            tt = rz.setup_tri_verts(tw @ c.cascade_view_projs[ci], None,
                                    S, S)
            tt = tt._replace(xy=tt.xy + jnp.asarray([ci * S, 0.0]))
            tl.append(tt)
        tris = rz.ScreenTris(
            xy=jnp.concatenate([x.xy for x in tl]),
            z=jnp.concatenate([x.z for x in tl]),
            inv_w=jnp.concatenate([x.inv_w for x in tl]),
            valid=jnp.concatenate([x.valid for x in tl]))
        return fr._shadow_bias(tris)

    tris = jax.jit(shadow_tris)(sc, consts)
    T1 = tris.xy.shape[0] // 4
    col = jnp.repeat(jnp.arange(4, dtype=jnp.float32), T1)
    xr = (col * S, (col + 1) * S)

    for th in (8, 4):
        for tpp in (8, 16, 32):
            rp.TILES_PER_PROG = tpp

            def shad(tr, th=th):
                d, _ = rp.rasterize_pallas(tr, 4 * S, S,
                                           cfgr.shadow_pair_capacity,
                                           tile_h=th, with_ids=False,
                                           xrange=xr)
                return d
            print(f"shadow tile_h={th} tpp={tpp}  {t(shad, tris):8.2f} ms",
                  flush=True)
    rp.TILES_PER_PROG = 16

    # fast preset full frame
    full = functools.partial(fr.render_frame, cfg=cfgr)
    print(f"frame parity          {t(full, sc, consts):8.2f} ms", flush=True)
    fast_cfg = dataclasses.replace(cfgr, fast_shadow_factor=True,
                                   ssao_scale=4, aniso_probes=2)
    # rebuild the random field at the new ssao res
    r2 = Renderer(scene, fast_cfg, lights=lights, auto_capacity=False)
    fullf = functools.partial(fr.render_frame, cfg=r2.cfg)
    print(f"frame fast-preset     "
          f"{t(fullf, r2.device_scene, r2.frame_constants(0.0)):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
