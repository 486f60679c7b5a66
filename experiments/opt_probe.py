"""Optimization probes on the real TPU (config 5 state):

1. shadow atlas kernel: tile_h 32 vs 8, matmul precision HIGHEST vs HIGH
2. SSAO tap-depth table: quad rows (16B) vs scalar rows (4B, 4x smaller)
3. PCF penumbra statistics: fraction of 8x128 pixel tiles whose shadow
   windows are uniform (all-lit / all-shadowed) -> upper bound for a
   uniform-tile early-out in a Pallas PCF kernel
4. capacity numbers for budgeting
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import config5_full_scene
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import shadows, ssao as ssao_ops
from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.ops import raster_pallas as rp
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
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width
    S = cfgr.shadow_map_size

    print("capacities:", r.capacity_requirements(0.0), flush=True)
    print("pair_capacity", cfgr.pair_capacity, "shadow",
          cfgr.shadow_pair_capacity, flush=True)
    print("pair pool rows", sc.pair_data.shape, "=",
          sc.pair_data.size * 4 / 1e6, "MB", flush=True)

    # ---- 1. shadow atlas kernel variants ----
    def shadow_tris(s, c):
        tw = fr.shadow_tri_world(s.shadow, c.shadow_visibility)
        tl = []
        for ci in range(4):
            tt = rz.setup_tri_verts(tw @ c.cascade_view_projs[ci], None,
                                    S, S)
            tt = tt._replace(xy=tt.xy + jnp.asarray([ci * S, 0.0]))
            tl.append(tt)
        tris = rz.ScreenTris(
            xy=jnp.concatenate([x.xy for x in tl]),
            z=jnp.concatenate([x.z for x in tl]),
            inv_w=jnp.concatenate([x.inv_w for x in tl]),
            valid=jnp.concatenate([x.valid for x in tl]))
        return fr._shadow_bias(tris)

    tris = jax.jit(shadow_tris)(sc, consts)
    T1 = tris.xy.shape[0] // 4
    col = jnp.repeat(jnp.arange(4, dtype=jnp.float32), T1)
    xr = (col * S, (col + 1) * S)

    for th in (32, 16, 8):
        def shad(tr, th=th):
            d, _ = rp.rasterize_pallas(tr, 4 * S, S,
                                       cfgr.shadow_pair_capacity,
                                       tile_h=th, with_ids=False, xrange=xr)
            return d
        print(f"shadow_full tile_h={th}  {t(shad, tris):8.2f} ms",
              flush=True)

    # ---- 2. SSAO tap table ----
    tris_m, tri_attr = fr.main_view_tris(sc, consts, cfgr)
    depth, tid = jax.jit(lambda tr: rp.rasterize_pallas(
        tr, W, H, cfgr.pair_capacity))(tris_m)
    tris_m = tris_m._replace(xy=rp.snap_xy(tris_m.xy))
    g = jax.jit(functools.partial(fr.resolve_gbuffer, cfg=cfgr))(
        sc, consts, tris=tris_m, depth=depth, tid=tid, tri_attr=tri_attr)

    def ssao_now(nv, d):
        return fr.ssao_pass(sc, consts, cfgr, nv, d)

    print(f"ssao quad-rows      {t(ssao_now, g['normal_v'], depth):8.2f} ms",
          flush=True)

    # scalar-table variant (monkeypatched)
    orig_quad = ssao_ops._quad_rows
    orig_tap = ssao_ops._tap_depth_border_white

    def scalar_rows(dm):
        return dm.reshape(-1), dm.shape[1]

    def scalar_tap(rows, h, w, u, v):
        x = jnp.floor(u * w).astype(jnp.int32)
        y = jnp.floor(v * h).astype(jnp.int32)
        inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        idx = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        return jnp.where(inb, rows[idx], 1.0)

    ssao_ops._quad_rows = scalar_rows
    ssao_ops._tap_depth_border_white = scalar_tap
    print(f"ssao scalar-rows    {t(ssao_now, g['normal_v'], depth):8.2f} ms",
          flush=True)
    ssao_ops._quad_rows = orig_quad
    ssao_ops._tap_depth_border_white = orig_tap

    # ---- 3. PCF penumbra-tile statistics ----
    shadow_maps = jax.jit(functools.partial(
        fr.render_shadow_maps, cfg=cfgr))(sc, consts)

    def tile_stats(sm, pw):
        swin = shadows.superwindow_maps_u16(sm)
        radii = jnp.asarray([30., 50., 80., 100.])
        dist = jnp.sqrt(((consts.eye_pos - pw) ** 2).sum(-1))
        past = (dist[..., None] >= radii).sum(-1).astype(jnp.int32)
        nb = swin.shape[1]
        flat = swin.reshape(-1, swin.shape[-1])
        ph = jnp.concatenate([pw, jnp.ones_like(pw[..., :1])], -1)
        all_pos = jnp.einsum("...i,cij->c...j", ph, consts.shadow_transforms)
        frac = []
        for cc in (jnp.clip(past, 0, 3), jnp.minimum(jnp.clip(past, 0, 3)
                                                     + 1, 3)):
            sel = (jnp.arange(4)[:, None, None, None]
                   == cc[None, ..., None]).astype(all_pos.dtype)
            sp = (all_pos * sel).sum(axis=0)
            uvz = sp[..., :3] / jnp.maximum(sp[..., 3:4], 1e-20)
            cx = uvz[..., 0] * S - 0.5
            cy = uvz[..., 1] * S - 0.5
            qx0 = jnp.clip((jnp.floor(cx).astype(jnp.int32) - 3) >> 3,
                           0, nb - 1)
            qy0 = jnp.clip((jnp.floor(cy).astype(jnp.int32) - 3) >> 3,
                           0, nb - 1)
            idx = (cc * nb + qy0) * nb + qx0
            win = shadows._unpack_u16_window(flat[idx])
            dq = uvz[..., 2:3] * 65535.0 - 0.5
            cmp = (dq <= win)
            uniform = cmp.all(-1) | (~cmp).all(-1)  # (H, W)
            # tile = 8 x 128 block
            ut = uniform[:H // 8 * 8, :W // 128 * 128].reshape(
                H // 8, 8, W // 128, 128).all(axis=(1, 3))
            frac.append(ut.mean())
        return jnp.stack(frac)

    fracs = jax.jit(tile_stats)(shadow_maps, g["pos_w"])
    print("uniform 8x128 tile fraction (cascade c, c+1):",
          np.asarray(fracs), flush=True)


if __name__ == "__main__":
    main()
