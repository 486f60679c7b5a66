import jax, jax.numpy as jnp, json
from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.passes import frame as fr
from crychic_renderer_tpu.ops import raster_pallas as rp

scene, cfg, lights = CONFIGS[5]()
r = Renderer(scene, cfg, lights=lights)
cfg = r.cfg
consts = r.frame_constants(0.0)
s_tris, xrange = fr.shadow_atlas_tris(r.device_scene, consts.shadow_visibility,
                                      consts.cascade_view_projs, cfg)
S = cfg.shadow_map_size; C = cfg.num_cascades

def f(tris):
    d, _, st = rp.rasterize_pallas(tris, C*S, S, cfg.shadow_pair_capacity,
                                   tile_h=fr.SHADOW_TILE_H, with_ids=False,
                                   xrange=xrange, with_stats=True,
                                   tiles_per_prog=32)
    return st

st = jax.jit(f)(s_tris)
print(json.dumps({k: int(v) for k, v in st.items()}))
# main view too
tris, _ = fr.main_view_tris(r.device_scene, consts, cfg)
def g(tris):
    d, t, st = rp.rasterize_pallas(tris, cfg.width, cfg.height,
                                   cfg.pair_capacity, with_stats=True)
    return st
st2 = jax.jit(g)(tris)
print(json.dumps({k: int(v) for k, v in st2.items()}))
print("caps:", cfg.shadow_pair_capacity, cfg.pair_capacity)
