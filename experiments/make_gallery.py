"""Render the committed README gallery on the real TPU.

Writes docs/gallery/*.png: all five BASELINE configs at native
resolution (downscaled 2x for repo size) plus the two debug views the
reference exposes (ShadowDebug.hlsl quad via cfg.debug_view=
"shadow_cascade3", and the commented-out cascade colorization as
"cascades" — /root/reference/Shaders/Default.hlsl:152-156).

Usage: python -m experiments.make_gallery [--small]
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def _save(img: np.ndarray, path: str, scale: int = 2):
    from crychic_renderer_tpu.app.renderer import write_png

    rgb = np.clip(img[..., :3], 0.0, 1.0).astype(np.float32)
    if scale > 1:  # box downscale (dependency-free, like write_png itself)
        h, w = rgb.shape[:2]
        h2, w2 = h // scale * scale, w // scale * scale
        rgb = rgb[:h2, :w2].reshape(h2 // scale, scale, w2 // scale,
                                    scale, 3).mean((1, 3))
    write_png(path, rgb)
    print(f"wrote {path} ({rgb.shape[1]}x{rgb.shape[0]})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="quarter-res (CPU-friendly smoke run)")
    ap.add_argument("--out", default="docs/gallery")
    ap.add_argument("--backend", default=None,
                    help="cpu|tpu (the sitecustomize tunnel ignores env "
                         "vars; this sets jax.config before backend init)")
    args = ap.parse_args()

    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
    from crychic_renderer_tpu.app.renderer import Renderer

    os.makedirs(args.out, exist_ok=True)
    captions = {
        1: "crate_forward", 2: "skull_forward", 3: "deferred_lights",
        4: "cascade_shadows_ssao", 5: "full_scene",
    }
    for n in sorted(CONFIGS):
        scene, cfg, lights = CONFIGS[n]()
        if args.small:
            # capacities are left alone: Renderer's auto_capacity resizes
            # them from exact pair counts anyway
            cfg = dataclasses.replace(
                cfg, width=cfg.width // 4, height=cfg.height // 4,
                shadow_map_size=max(cfg.shadow_map_size // 4, 128))
        r = Renderer(scene, cfg, lights=lights)
        _save(r.render_np(0.1), f"{args.out}/config{n}_{captions[n]}.png",
              scale=1 if args.small else 2)
        if n == 4:
            for view in ("cascades", "shadow_cascade3"):
                r.cfg = dataclasses.replace(r.cfg, debug_view=view)
                r.rebind_frame_fn()
                _save(r.render_np(0.1), f"{args.out}/config4_{view}.png",
                      scale=1 if args.small else 2)


if __name__ == "__main__":
    main()
