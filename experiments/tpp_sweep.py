"""tiles_per_prog sweep for the FMA raster kernel (atlas + main view)."""
import time
import jax, jax.numpy as jnp
from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.passes import frame as fr
from crychic_renderer_tpu.ops import raster_pallas as rp


def run(fn, *a):
    def g(*aa):
        leaves = jax.tree_util.tree_leaves(fn(*aa))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    f = jax.jit(g)
    _ = float(f(*a))
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        o = f(*a)
        _ = float(o)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    scene, cfg, lights = CONFIGS[5]()
    r = Renderer(scene, cfg, lights=lights)
    cfg = r.cfg
    consts = r.frame_constants(0.0)
    s_tris, xr = fr.shadow_atlas_tris(r.device_scene,
                                      consts.shadow_visibility,
                                      consts.cascade_view_projs, cfg)
    m_tris, _ = fr.main_view_tris(r.device_scene, consts, cfg)
    S, C = cfg.shadow_map_size, cfg.num_cascades
    for tpp in (8, 16, 32, 64):
        ms = run(lambda t, tp=tpp: rp.rasterize_pallas(
            t, C * S, S, cfg.shadow_pair_capacity, tile_h=fr.SHADOW_TILE_H,
            with_ids=False, xrange=xr, tiles_per_prog=tp), s_tris)
        print(f"atlas tpp={tpp}: {ms:.1f} ms", flush=True)
    for tpp in (8, 16, 32, 64):
        ms = run(lambda t, tp=tpp: rp.rasterize_pallas(
            t, cfg.width, cfg.height, cfg.pair_capacity,
            tiles_per_prog=tp), m_tris)
        print(f"main tpp={tpp}: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
