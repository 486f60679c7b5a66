"""Measure tile-compacted SSAO occlusion (round 5).

VERDICT r4 item 2 asked for a superwindow attack on the 14 SSAO tap
gathers (~7.3M rows, ~39 ms). The superwindow form itself is a DEAD END
by arithmetic: a tap's screen-space footprint is occlusionRadius*proj/z
full-res texels — 651/z at 1080p config 5, i.e. 22-65 texels over the
z range that holds geometry — so no window that fits a gatherable row
(<=128 f32 texels = 11x11) covers even the FAR pixels' footprints, and
u16-quantizing the NDC depth to double the window is out: at z=50 a u16
step is ~0.04 VIEW units vs surface_eps=0.05 (it would flip occlusion
comparisons, not parity).

What DOES cut rows is issuing fewer of them: ~half of config 5's SSAO
grid is sky whose access never reaches a lit pixel, so the occlusion is
tile-compacted like the resolve (frame._ssao_occlusion_compacted,
cfg.ssao_tile_capacity autosized). This probe measures ssao_pass and the
fused frame with and without compaction on the real chip.

Run ON THE TPU: python -m experiments.ssao_compact_probe
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.ops import raster_pallas as rp
from crychic_renderer_tpu.passes import frame as fr


def amortized(fn, *args, n=20):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    f = jax.jit(scalarized)
    _ = float(f(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        out = f(*args)
    _ = float(out)
    return 1000.0 * (time.perf_counter() - t0) / n


def main():
    for c in (5, 2):
        scene_py, cfg, lights = CONFIGS[c]()
        if not cfg.ssao_enabled:
            cfg = dataclasses.replace(cfg, ssao_enabled=True)
        r = Renderer(scene_py, cfg, lights=lights)
        cfg = r.cfg
        scene, consts = r.device_scene, r.frame_constants(0.0)
        req = r.check_capacity(0.0)
        nt = (-(-cfg.ssao_height // fr.SSAO_TILE_H)
              * -(-cfg.ssao_width // fr.SSAO_TILE_W))
        print(f"config {c}: ssao tiles {req['ssao_tiles']} / {nt} "
              f"({100.0 * req['ssao_tiles'] / nt:.0f}%), "
              f"capacity {cfg.ssao_tile_capacity}", flush=True)

        def stages(scene, consts, cfgr):
            tris, tri_attr = fr.main_view_tris(scene, consts, cfgr)
            if cfgr.use_pallas:
                depth, tid = rp.rasterize_pallas(tris, cfgr.width,
                                                 cfgr.height,
                                                 cfgr.pair_capacity)
            else:
                bins = rz.bin_triangles(tris, cfgr.width, cfgr.height,
                                        cfgr.pair_capacity)
                depth, tid = rz.rasterize_binned(tris, bins, cfgr.width,
                                                 cfgr.height, cfgr.bin_cap)
            g = fr.resolve_gbuffer(scene, consts, cfgr, tris, depth, tid,
                                   tri_attr)
            return g["normal_v"], depth, tid

        nv, depth, tid = jax.jit(
            functools.partial(stages, cfgr=cfg))(scene, consts)
        nv, depth, tid = map(jnp.asarray, (nv, depth, tid))
        valid = tid >= 0

        cfg_full = dataclasses.replace(cfg, ssao_tile_capacity=None)
        t_full = amortized(
            lambda s, c_, n, d: fr.ssao_pass(s, c_, cfg_full, n, d),
            scene, consts, nv, depth)
        t_comp = amortized(
            lambda s, c_, n, d, v: fr.ssao_pass(s, c_, cfg, n, d, valid=v),
            scene, consts, nv, depth, valid)
        print(f"  ssao_pass full    {t_full:8.2f} ms", flush=True)
        print(f"  ssao_pass compact {t_comp:8.2f} ms", flush=True)

        f_full = amortized(functools.partial(fr.render_frame, cfg=cfg_full),
                           scene, consts)
        f_comp = amortized(functools.partial(fr.render_frame, cfg=cfg),
                           scene, consts)
        print(f"  frame full        {f_full:8.2f} ms", flush=True)
        print(f"  frame compact     {f_comp:8.2f} ms", flush=True)

        a = jax.jit(functools.partial(fr.render_frame, cfg=cfg))(
            scene, consts)
        b = jax.jit(functools.partial(fr.render_frame, cfg=cfg_full))(
            scene, consts)
        d = np.abs(np.asarray(a) - np.asarray(b))
        print(f"  image max |diff|  {d.max():.2e} "
              f"(>1/255: {(d > 1 / 255).mean():.5%})", flush=True)


if __name__ == "__main__":
    main()
