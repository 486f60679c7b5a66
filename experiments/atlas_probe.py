"""Amortized shadow-atlas pass timing (config 5, 4x2048^2 cascades).

Measures the full render_shadow_maps jit (setup + binning + Pallas atlas
kernel) as back-to-back dispatch throughput — the methodology that
matches bench.py's amortized frame loop (per-dispatch queue overhead
~1.5 ms, not the ~30 ms single-dispatch round-trip latency).

Run ON THE TPU: python -m experiments.atlas_probe
"""
import time

import jax


def main():
    from crychic_renderer_tpu.models.scenes_baseline import (
        config5_full_scene)
    from crychic_renderer_tpu.app.renderer import Renderer
    from crychic_renderer_tpu.passes import frame as fr

    scene, cfg, lights = config5_full_scene()
    r = Renderer(scene, cfg, lights=lights)
    consts = r.frame_constants(0.0)
    fn = jax.jit(lambda s, c: fr.render_shadow_maps(s, c, r.cfg).sum())
    t0 = time.perf_counter()
    _ = float(fn(r.device_scene, consts))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = None
    for _i in range(20):
        out = fn(r.device_scene, consts)
    _ = float(out)
    print(f"shadow atlas amortized: "
          f"{1000 * (time.perf_counter() - t0) / 20:.2f} ms")


if __name__ == "__main__":
    main()
