"""Config-5 SSAO decomposition on real intermediates (round 4: SSAO grew
to ~48 ms after the full-res linear-tap parity change — which term?).

Times: full ssao_pass, occlusion only, blurs only, occlusion with the 14
projective taps short-circuited to the center depth (bounds the tap
GATHER + tap math term), and occlusion with 7 taps (gather scaling).
Run ON THE TPU: python experiments/ssao_decomp5.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import raster_pallas as rp
from crychic_renderer_tpu.ops import ssao as ssao_ops
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
    scene, cfg, lights = CONFIGS[5]()
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width

    @jax.jit
    def front(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        depth, tid = rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)
        g = fr.resolve_gbuffer(sc, consts, cfgr, tris, depth, tid, tri_attr)
        return depth, g["normal_v"]

    depth, normal_v = jax.block_until_ready(front(sc, consts))

    t = amortized(lambda s, c, n, d: fr.ssao_pass(s, c, cfgr, n, d),
                  sc, consts, normal_v, depth)
    print(f"  ssao_pass (occl + {cfgr.ssao_blur_count}x2 blurs) {t:8.2f} ms",
          flush=True)

    def occl(s, c, n, d):
        n_half, d_half = fr.ssao_inputs_half(cfgr, n, d)
        return ssao_ops.ssao_occlusion(
            n_half, d_half, c.proj, c.inv_proj, s.ssao_offsets,
            random_field=s.ssao_random_field, tap_depth=d)

    t_occ = amortized(occl, sc, consts, normal_v, depth)
    print(f"  occlusion only                  {t_occ:8.2f} ms", flush=True)

    # blur only on a precomputed access map
    acc0 = jax.block_until_ready(jax.jit(occl)(sc, consts, normal_v, depth))

    def blurs(s, c, a, n, d):
        n_half, d_half = fr.ssao_inputs_half(cfgr, n, d)
        return fr.ssao_blur(s, c, cfgr, a, n_half, d_half)

    t_blur = amortized(blurs, sc, consts, acc0, normal_v, depth)
    print(f"  blurs only                      {t_blur:8.2f} ms", flush=True)

    # tap-gather bound: occlusion with the projective tap depth replaced
    # by the center depth (same math, ZERO tap gathers)
    import crychic_renderer_tpu.ops.ssao as so

    orig = so._tap_depth_bilinear_white
    try:
        so._tap_depth_bilinear_white = (
            lambda rows, h, w, u, v: jnp.zeros_like(u) + 0.5)
        t_notap = amortized(occl, sc, consts, normal_v, depth)
    finally:
        so._tap_depth_bilinear_white = orig
    print(f"  occlusion[taps=const]           {t_notap:8.2f} ms", flush=True)
    print(f"  -> tap gather term ~ {t_occ - t_notap:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
