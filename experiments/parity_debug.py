"""Narrow the pallas-vs-XLA disagreement: compare per-pass buffers
(main depth/tid, shadow maps, final image) for config 4 small on TPU."""
import sys
import dataclasses
import functools

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.passes import frame as fr
from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.ops import raster_pallas as rp


def main(config=4):
    scene, cfg, lights = CONFIGS[config]()
    cfg = dataclasses.replace(
        cfg, width=cfg.width // 4, height=cfg.height // 4,
        shadow_map_size=max(cfg.shadow_map_size // 4, 128))
    r = Renderer(scene, dataclasses.replace(cfg, use_pallas=True),
                 lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfg_p = r.cfg
    cfg_x = dataclasses.replace(r.cfg, use_pallas=False)
    # use the XLA-path bin sizing
    rx = Renderer(scene, dataclasses.replace(cfg, use_pallas=False),
                  lights=lights)
    cfg_x = rx.cfg
    H, W = cfg_p.height, cfg_p.width

    def bufs(cfgv):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgv)
        if cfgv.use_pallas:
            depth, tid = rp.rasterize_pallas(tris, W, H, cfgv.pair_capacity)
        else:
            bins = rz.bin_triangles(tris, W, H, cfgv.pair_capacity)
            depth, tid = rz.rasterize_binned(tris, bins, W, H, cfgv.bin_cap)
        sm = fr.render_shadow_maps(sc, consts, cfgv)
        return depth, tid, sm

    dp, tp, smp = jax.jit(functools.partial(bufs, cfg_p))()
    dx, tx, smx = jax.jit(functools.partial(bufs, cfg_x))()
    dp, tp, smp, dx, tx, smx = map(np.asarray, (dp, tp, smp, dx, tx, smx))

    dd = np.abs(dp - np.where(np.isfinite(dx), dx, dp))
    print(f"main depth: frac tid!= {(tp != tx).mean():.5f}   "
          f"depth maxdiff {np.nanmax(np.where(np.isfinite(dp) & np.isfinite(dx), np.abs(dp-dx), 0)):.2e}",
          flush=True)
    covp = tp >= 0
    covx = tx >= 0
    print(f"coverage: pallas {covp.mean():.4f} xla {covx.mean():.4f} "
          f"disagree {(covp != covx).mean():.5f}", flush=True)
    for c in range(smp.shape[0]):
        a, b = smp[c], smx[c]
        d = np.abs(a - b)
        print(f"shadow c{c}: maxdiff {d.max():.4e} frac>1e-3 "
              f"{(d > 1e-3).mean():.5f} covp {(a < 1).mean():.4f} "
              f"covx {(b < 1).mean():.4f}", flush=True)

    # where do tids disagree? sample some
    ys, xs = np.where((tp != tx) & covp & covx)
    print("both-covered tid disagreements:", len(ys), flush=True)
    for i in range(0, min(5, len(ys))):
        y, x = ys[i], xs[i]
        print(f"  px ({y},{x}): pallas tid {tp[y,x]} z {dp[y,x]:.6f} | "
              f"xla tid {tx[y,x]} z {dx[y,x]:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
