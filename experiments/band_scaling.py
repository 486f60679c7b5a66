"""Evidence for the multi-chip scaling projection: measure the parity
frame at band heights 1080/N on the ONE real chip. In the sharded design
each device renders exactly such a band (plus the cascade all_gather and
a 1-row halo), so band timings bound the per-device cost of an N-chip
mesh. Shadow maps are cascade-parallel (4 devices cover them), so for
N >= 4 each device renders <= 1 cascade; this probe keeps the full
4-cascade atlas (conservative upper bound for N <= 4) and also reports a
shadowless band (lower-bound component for N >= 4 non-shadow devices).
"""
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
    for n in (1, 2, 4, 8):
        h = 1080 // n
        c = dataclasses.replace(cfg, height=h)
        r = Renderer(scene, c, lights=lights)
        sc, consts = r.device_scene, r.frame_constants(0.0)
        full = functools.partial(fr.render_frame, cfg=r.cfg)
        ms = t(full, sc, consts)
        c2 = dataclasses.replace(r.cfg, shadows_enabled=False)
        ms2 = t(functools.partial(fr.render_frame, cfg=c2), sc, consts)
        print(f"band 1080/{n} ({h} rows): full {ms:8.2f} ms   "
              f"no-shadow {ms2:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
