"""Quantify the anisotropic-filtering probe schedules against a
reference-quality evaluation (VERDICT r3 missing #3 + next-round item 2a).

The yardstick is ``sample_pair_aniso_ref``: max_aniso (=8) probes along
the major-axis footprint, each an exact two-gather trilinear — the
quality D3D12_FILTER_ANISOTROPIC hardware meets or beats. Candidates:

- legacy4: the round-1..3 production schedule (single-mip pool, 4 probes
  ALTERNATING mips m0/m1 with weights 1-f/f) — 4 row gathers;
- dual2 / dual4: dual-mip rows (one gather per probe covers BOTH mips),
  2 or 4 purely-spatial probes — 2 / 4 row gathers;
- trilinear: isotropic footprint (1 dual gather) for scale.

Renders the texture-heaviest BASELINE configs (5: skull+car over the
tiled ground at grazing angles; 1: single box) at 1/4 scale on CPU with
each schedule and reports PSNR + perceptual fractions vs the reference
render. Run: python experiments/aniso_quality.py
"""
from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from crychic_renderer_tpu.models.scenes_baseline import CONFIGS  # noqa: E402
from crychic_renderer_tpu.app.renderer import Renderer  # noqa: E402


def metrics(img, ref):
    d = np.abs(img[..., :3] - ref[..., :3])
    mse = float((d ** 2).mean())
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    u8 = np.abs((np.clip(img[..., :3], 0, 1) * 255 + 0.5).astype(np.int16)
                - (np.clip(ref[..., :3], 0, 1) * 255 + 0.5).astype(np.int16))
    return psnr, float((u8 > 5).mean()), float((u8 > 2).mean())


def main():
    for c in (1, 5):
        scene, cfg, lights = CONFIGS[c]()
        k = 4
        cfg = dataclasses.replace(
            cfg, width=cfg.width // k, height=cfg.height // k,
            shadow_map_size=max(cfg.shadow_map_size // k, 128))

        variants = {
            "ref (8x trilinear, 16 gathers)":
                dataclasses.replace(cfg, aniso_probes=0, dual_mip_rows=False),
            "legacy4 (4 gathers)":
                dataclasses.replace(cfg, aniso_probes=4,
                                    dual_mip_rows=False),
            "dual2   (2 gathers)":
                dataclasses.replace(cfg, aniso_probes=2, dual_mip_rows=True),
            "dual4   (4 gathers)":
                dataclasses.replace(cfg, aniso_probes=4, dual_mip_rows=True),
            "trilinear (1 dual gather)":
                dataclasses.replace(cfg, anisotropy=1, dual_mip_rows=True),
        }
        ref = None
        print(f"== config {c} ({cfg.width}x{cfg.height})", flush=True)
        for name, v in variants.items():
            img = Renderer(scene, v, lights=lights).render_np(0.0)
            if ref is None:
                ref = img
                print(f"  {name:34s}  (reference)", flush=True)
                continue
            psnr, f5, f2 = metrics(img, ref)
            print(f"  {name:34s}  PSNR {psnr:6.2f} dB   "
                  f">2% px {f5:.4%}   >0.8% px {f2:.4%}", flush=True)


if __name__ == "__main__":
    main()
