"""TPU timing of the dual-mip pair-row schedules (VERDICT r3 item 2a).

Times the full config-5 frame (amortized, bench-style) under:
legacy4 (single-mip pool, 4 alternating probes — the r3 production path),
dual4 / dual2 (dual-mip pool, 4 / 2 true-trilinear probes), and
config 1 with legacy4 vs dual2. Also prints pool sizes (the gather-tier
variable). Run ON THE TPU: python experiments/dual_mip_timing.py
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


def run(c, variants):
    scene, cfg0, lights = CONFIGS[c]()
    print(f"== config {c}", flush=True)
    for name, over in variants.items():
        cfg = dataclasses.replace(cfg0, **over)
        r = Renderer(scene, cfg, lights=lights)
        sc = r.device_scene
        consts = r.frame_constants(0.0)
        cfgr = r.cfg
        pool_mb = sc.pair_data.size * 4 / 1e6

        def full(sc, consts):
            return fr.render_frame(sc, consts, cfgr)

        t = amortized(full, sc, consts)
        print(f"  {name:12s} pool {pool_mb:7.1f} MB   {t:8.2f} ms",
              flush=True)


def main():
    run(5, {
        "legacy4": dict(dual_mip_rows=False, aniso_probes=4),
        "dual4": dict(dual_mip_rows=True, aniso_probes=4),
        "dual2": dict(dual_mip_rows=True, aniso_probes=2),
    })
    run(1, {
        "legacy4": dict(dual_mip_rows=False, aniso_probes=4),
        "dual2": dict(dual_mip_rows=True, aniso_probes=2),
        "dual4": dict(dual_mip_rows=True, aniso_probes=4),
    })


if __name__ == "__main__":
    main()
