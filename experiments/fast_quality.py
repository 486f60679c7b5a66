"""Quantify the --fast preset's image quality vs parity (VERDICT r3
weak #3: the preset's cost was a number, its quality was prose).

Renders configs 4 and 5 at native resolution with the parity defaults
and with cfg.fast_preset(), then reports PSNR and SSIM of fast vs
parity, plus the fraction of pixels moved >2%. Also writes the gallery
pair docs/gallery/config5_{parity,fast}.png.

SSIM here is the standard Wang et al. formulation with an 11x11
Gaussian window (sigma 1.5), computed per channel on the [0,1] float
image and averaged — implemented in numpy so the repo stays
dependency-free.

Usage: python -m experiments.fast_quality [--small] [--configs 4 5]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

if os.environ.get("FAST_QUALITY_CPU"):
    # sitecustomize force-selects the axon TPU at interpreter start; the
    # env var alone does not override it (CLAUDE.md gotchas)
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")


def _gauss_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / g.sum()


def _filter2_sep(img, k):
    """Separable 'valid' 2D filter of (H, W) with 1D kernel k."""
    from numpy.lib.stride_tricks import sliding_window_view

    a = sliding_window_view(img, len(k), axis=0) @ k
    return sliding_window_view(a, len(k), axis=1) @ k


def ssim(a, b, data_range=1.0):
    """Mean SSIM over channels, 11x11 Gaussian window."""
    k = _gauss_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch].astype(np.float64), b[..., ch].astype(np.float64)
        mx, my = _filter2_sep(x, k), _filter2_sep(y, k)
        mxx, myy, mxy = mx * mx, my * my, mx * my
        sx = _filter2_sep(x * x, k) - mxx
        sy = _filter2_sep(y * y, k) - myy
        sxy = _filter2_sep(x * y, k) - mxy
        m = ((2 * mxy + c1) * (2 * sxy + c2)
             / ((mxx + myy + c1) * (sx + sy + c2)))
        vals.append(m.mean())
    return float(np.mean(vals))


def psnr(a, b, data_range=1.0):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range * data_range / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1/4 resolution (CPU-friendly smoke run)")
    ap.add_argument("--configs", type=int, nargs="+", default=[4, 5])
    ap.add_argument("--gallery", default="docs/gallery")
    args = ap.parse_args()

    from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
    from crychic_renderer_tpu.app.renderer import Renderer, write_png

    for c in args.configs:
        scene, cfg, lights = CONFIGS[c]()
        if args.small:
            cfg = dataclasses.replace(
                cfg, width=cfg.width // 4, height=cfg.height // 4,
                shadow_map_size=max(cfg.shadow_map_size // 4, 128))
        par = Renderer(scene, cfg, lights=lights).render_np(0.1)
        fast = Renderer(scene, cfg.fast_preset(),
                        lights=lights).render_np(0.1)
        a = np.clip(par[..., :3], 0.0, 1.0)
        b = np.clip(fast[..., :3], 0.0, 1.0)
        moved = (np.abs(a - b).max(-1) > 0.02).mean()
        print(f"config {c}: fast-vs-parity  PSNR {psnr(a, b):6.2f} dB   "
              f"SSIM {ssim(a, b):.4f}   pixels moved >2%: {moved:.2%}",
              flush=True)
        if c == 5 and not args.small:
            os.makedirs(args.gallery, exist_ok=True)
            for name, img in (("parity", a), ("fast", b)):
                h, w = (x // 2 * 2 for x in img.shape[:2])
                d = img[:h, :w].reshape(h // 2, 2, w // 2, 2, 3).mean((1, 3))
                write_png(f"{args.gallery}/config5_{name}.png",
                          d.astype(np.float32))
                print(f"wrote {args.gallery}/config5_{name}.png", flush=True)


if __name__ == "__main__":
    main()
