"""Amortized ms/frame for all five BASELINE configs (parity defaults and
the --fast preset) on the real chip."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")


def run(cfg_fn, fast=False):
    from crychic_renderer_tpu.app.renderer import Renderer

    scene, cfg, lights = cfg_fn()
    if fast:
        cfg = cfg.fast_preset()
    r = Renderer(scene, cfg, lights=lights)
    img = r.render(0.0)
    _ = float(img[0, 0, 0])
    n = 12
    t0 = time.perf_counter()
    last = None
    for i in range(n):
        last = r.render(i / 60.0)
    _ = float(last[0, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / n


def main():
    from crychic_renderer_tpu.models.scenes_baseline import CONFIGS

    for c in (1, 2, 3, 4, 5):
        ms = run(CONFIGS[c])
        if c in (4, 5):
            msf = run(CONFIGS[c], fast=True)
            print(f"config {c}: {ms:8.2f} ms/frame   fast {msf:8.2f}",
                  flush=True)
        else:
            print(f"config {c}: {ms:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
