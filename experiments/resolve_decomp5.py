"""Config-5 resolve_gbuffer decomposition on real intermediates (round 4:
why did halving the texture gathers (dual2) not move the 65 ms resolve?).

Times resolve variants that share the SAME dual-mip pool (so one scene
build): dual2 (default), dual4, trilinear (1 gather), and tid=0 (record
gather short-circuited), plus an empty-math bound (records only, no
texture): isolates record-gather vs texture-gather vs VPU terms.
Run ON THE TPU: python experiments/resolve_decomp5.py
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
    print(f"pool {sc.pair_data.size * 4 / 1e6:.1f} MB "
          f"rows {sc.pair_data.shape}", flush=True)

    @jax.jit
    def front(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        depth, tid = rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)
        return tris, tri_attr, depth, tid

    tris, tri_attr, depth, tid = jax.block_until_ready(front(sc, consts))

    def mk(cfgv):
        def resolve(sc, consts, tris, depth, tid, tri_attr):
            return fr.resolve_gbuffer(sc, consts, cfgv, tris, depth, tid,
                                      tri_attr)
        return resolve

    variants = {
        "dual2 (default)": cfgr,
        "dual4": dataclasses.replace(cfgr, aniso_probes=4),
        "trilinear (1 gather)": dataclasses.replace(cfgr, anisotropy=1),
    }
    for name, cfgv in variants.items():
        t = amortized(mk(cfgv), sc, consts, tris, depth, tid, tri_attr)
        print(f"  resolve[{name:22s}] {t:8.2f} ms", flush=True)

    z = jnp.zeros_like(tid)
    t = amortized(lambda s, c, tr, de, ti, ta:
                  fr.resolve_gbuffer(s, c, cfgr, tr, de, z, ta),
                  sc, consts, tris, depth, tid, tri_attr)
    print(f"  resolve[tid=0         ] {t:8.2f} ms", flush=True)
    t = amortized(lambda s, c, tr, de, ti, ta: fr.resolve_gbuffer(
        s, c, dataclasses.replace(cfgr, anisotropy=1), tr, de, z, ta),
        sc, consts, tris, depth, tid, tri_attr)
    print(f"  resolve[tid=0+trilin  ] {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
