"""Per-device timing of the ACTUAL sharded band path on the one real chip.

Round 2 projected multi-chip scaling from band-height frames with a
CHANGED camera aspect (band_scaling.py), which altered the frustum and
pair counts — not the sharded code path (VERDICT r2 weak #2c). This
harness jits `parallel.sharded._band_render` itself — the exact per-device
program shard_map runs, including the replicated triangle setup, the
band-restricted binning, the atlas band, and every gather's receive-buffer
materialization — with `_Comm(sim_index=d)` standing in for the mesh
(all_gather -> n_dev-fold tile of the local shard; same output shapes and
HBM writes). NOTE: the simulated gather carries the LOCAL shard's data in
every slot, so the rendered image is deliberately WRONG for n_dev > 1 —
this harness times the program; image correctness is validated by the
shard_map tests (tests/test_multichip.py), which run real collectives. What it cannot model is the ICI transfer itself, so the
report also prints the per-device all-gather byte volume and a parametric
time estimate at 45 / 100 GB/s effective ICI bandwidth.

Run ON THE TPU (no env overrides):
    python -m experiments.sharded_band_timing --config 5 --n-dev 8
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--n-dev", type=int, nargs="+", default=[8])
    ap.add_argument("--bands", type=int, nargs="+", default=None,
                    help="device indices to time (default: first, middle "
                    "= horizon band, last)")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
    from crychic_renderer_tpu.app.renderer import Renderer
    from crychic_renderer_tpu.parallel import sharded

    scene, cfg, lights = CONFIGS[args.config]()
    if args.fast:
        cfg = dataclasses.replace(cfg, fast_shadow_factor=True,
                                  ssao_scale=4, aniso_probes=2)
    r = Renderer(scene, cfg, lights=lights)
    cfg = r.cfg
    consts = r.frame_constants(0.0)
    report = {"config": args.config, "fast": args.fast,
              "use_pallas": cfg.use_pallas, "n_dev": {}}

    for n in args.n_dev:
        band_h = sharded.band_height(cfg, n)
        scene_d = r.device_scene
        # right-size the per-band binning capacities from exact worst-band
        # pair counts (the sort cost scales with the static capacity)
        cfg_n = sharded.autosize_band_capacities(scene_d, consts, cfg, n)
        print(f"n_dev={n}: band caps main="
              f"{cfg_n.band_pair_capacity} shadow="
              f"{cfg_n.shadow_band_pair_capacity}", flush=True)
        if cfg.ssao_enabled:
            need = band_h * n // cfg.ssao_scale
            if scene_d.ssao_random_field.shape[0] < need:
                scene_d = dataclasses.replace(
                    scene_d, ssao_random_field=sharded._pad_rows(
                        scene_d.ssao_random_field, need))
        bands = args.bands or sorted({0, n // 2, n - 1})
        times = {}
        for d in bands:
            comm = sharded._Comm("sp", n, sim_index=d)

            def band_fn(scene, consts, comm=comm):
                img = sharded._band_render(scene, consts, cfg_n, comm,
                                           band_h)
                return img.sum()  # scalar readback (tunnel sync rule)

            fn = jax.jit(band_fn)
            t0 = time.perf_counter()
            _ = float(fn(scene_d, consts))  # compile + warm
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = None
            for _i in range(args.frames):
                out = fn(scene_d, consts)
            _ = float(out)
            ms = 1000.0 * (time.perf_counter() - t0) / args.frames
            times[d] = round(ms, 2)
            print(f"n_dev={n} band d={d}: {ms:.1f} ms/frame "
                  f"(band_h={band_h}, compile {compile_s:.0f}s)",
                  flush=True)

        # per-device all_gather receive volume ((n-1)/n of each full buffer)
        C, S = cfg.num_cascades, cfg.shadow_map_size
        H, W = cfg.height, cfg.width
        # shadow stack: u16-packed when the production gate holds (see
        # _band_render), f32 otherwise
        packed = (cfg_n.use_pallas
                  and not (cfg_n.alpha_test_enabled
                           and scene_d.alpha is not None)
                  and cfg_n.deferred and cfg_n.debug_view is None)
        bytes_full = C * S * S * (2 if packed else 4)
        bytes_full += band_h * n * W * 8  # interleaved depth + tid buffer
        # triangle-sharded geometry reassembly: clipped tri_attr (2T x 3
        # x 16 f32). Shadow tri_world is no longer exchanged (statics
        # made it a replicated vis multiply — parallel/sharded.py).
        T_main = r.device_scene.opaque.indices.shape[0] // 3
        bytes_full += 2 * T_main * 3 * 16 * 4
        if cfg.ssao_enabled:
            hw = (H // cfg.ssao_scale) * (W // cfg.ssao_scale)
            bytes_full += hw * 4 * (1 + 1 + 3)  # depth + access + normals
        if cfg.fast_shadow_factor and cfg.shadows_enabled:
            bytes_full += (H // 2) * W * 4
        ici = bytes_full * (n - 1) / n
        report["n_dev"][n] = {
            "band_h": band_h, "band_ms": times,
            "worst_band_ms": max(times.values()),
            "allgather_mb_per_dev": round(ici / 1e6, 1),
            "ici_ms_at_45GBps": round(1000 * ici / 45e9, 2),
            "ici_ms_at_100GBps": round(1000 * ici / 100e9, 2),
            "projected_ms": round(
                max(times.values()) + 1000 * ici / 45e9, 1),
        }
        print(json.dumps(report["n_dev"][n]), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
