"""Probe: hot-row contention from INVALID pixels in the real frame.

dup_gather_probe measured that funneling many gather indices into one
shared row SLOWS the gather (73 vs 44 ns/row at 90% duplicates). The
frame does exactly that in three places, config 5 being ~1/3 sky:

  - resolve: safe_tid = max(tid, 0) sends EVERY invalid pixel to record
    row 0;
  - PCF: invalid pixels' garbage pos_w projects to few clamped
    superwindow rows;
  - aniso: invalid pixels' garbage uv derivatives select the top (1x1-ish)
    mips, which hold few distinct rows.

This probe (a) measures the invalid fraction and top-row concentration of
the real index streams, and (b) times the real gathers with the real
indices vs spread substitutes (invalid pixels redirected over many rows).

Run ON THE TPU: python -m experiments.hot_row_probe
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from crychic_renderer_tpu.models.scenes_baseline import config5_full_scene
from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.ops import shadows, raster_pallas as rp
from crychic_renderer_tpu.passes import frame as fr


def amortized(fn, *args, n=20):
    g = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda s, l: s + jnp.sum(l.astype(jnp.float32)),
        fn(*a), jnp.float32(0)))
    _ = float(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    scene, cfg, lights = config5_full_scene()
    r = Renderer(scene, cfg, lights=lights)
    sc = r.device_scene
    consts = r.frame_constants(0.0)
    cfgr = r.cfg
    H, W = cfgr.height, cfgr.width
    N = H * W

    @jax.jit
    def front(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        depth, tid = rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)
        return tris, tri_attr, depth, tid

    tris, tri_attr, depth, tid = jax.block_until_ready(front(sc, consts))
    T = tri_attr.shape[0]
    tid_np = np.asarray(tid)
    invalid = tid_np < 0
    print(f"invalid pixels: {invalid.mean() * 100:.1f}%  (T={T})",
          flush=True)

    # --- record gather: real hot-row vs duplicated-row-0 spread ---------
    rec = jax.block_until_ready(jax.jit(
        lambda ta, tr: jnp.pad(jnp.concatenate([
            tr.xy.reshape(-1, 6), tr.inv_w,
            ta[:, 0, 4:7], ta[:, 1, 4:7], ta[:, 2, 4:7],
            ta[:, 0, 7:10], ta[:, 1, 7:10], ta[:, 2, 7:10],
            ta[:, 0, 10:13], ta[:, 1, 10:13], ta[:, 2, 10:13],
            ta[:, 0, 13:15], ta[:, 1, 13:15], ta[:, 2, 13:15],
            ta[:, 0, 15:16]], axis=-1), ((0, 0), (0, 21)))
    )(tri_attr, tris))
    safe = jnp.maximum(tid, 0)

    def g_rec(rec, idx):
        return rec[idx]

    t_hot = amortized(g_rec, rec, safe)

    K = 1024
    rec_pad = jnp.concatenate([rec, jnp.tile(rec[0:1], (K, 1))])
    pix = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, :])
    spread = jnp.where(tid >= 0, jnp.maximum(tid, 0), T + pix % K)
    t_spread = amortized(g_rec, rec_pad, spread)
    print(f"record gather: hot(row0) {t_hot:7.2f} ms vs "
          f"spread(+{K} dup rows) {t_spread:7.2f} ms", flush=True)

    # --- PCF window index concentration + gather timing ------------------
    g = jax.block_until_ready(jax.jit(
        lambda sc, consts, tris, depth, tid, ta: fr.resolve_gbuffer(
            sc, consts, cfgr, tris, depth, tid, ta))(
                sc, consts, tris, depth, tid, tri_attr))
    shadow_maps = jax.block_until_ready(jax.jit(
        lambda sc, consts: fr.render_shadow_maps(sc, consts, cfgr))(
            sc, consts))

    @jax.jit
    def pcf_indices(sm, consts, pos_w):
        from crychic_renderer_tpu.models.cascades import CASCADE_RADII
        from crychic_renderer_tpu.ops.shading import rowmat
        radii = jnp.asarray(CASCADE_RADII)
        dist = jnp.sqrt(((consts.eye_pos - pos_w) ** 2).sum(-1))
        past = (dist[..., None] >= radii[None, None, :]).sum(-1)
        c = jnp.clip(past, 0, 3).astype(jnp.int32)
        ph = jnp.concatenate([pos_w, jnp.ones_like(pos_w[..., :1])], -1)
        all_pos = jnp.stack([rowmat(ph, consts.shadow_transforms[ci])
                             for ci in range(4)])
        even = (c & 1) == 0
        ce = jnp.where(even, c, jnp.minimum(c + 1, 2))
        sel = (jnp.arange(4)[:, None, None, None] == ce[None, ..., None])
        sp = (all_pos * sel).sum(0)
        inv_w = 1.0 / jnp.maximum(sp[..., 3], 1e-20)
        u = sp[..., 0] * inv_w
        v = sp[..., 1] * inv_w
        S = cfgr.shadow_map_size
        nb = S // 8
        x_lo = jnp.floor(u * S - 0.5).astype(jnp.int32) - 3
        y_lo = jnp.floor(v * S - 0.5).astype(jnp.int32) - 3
        qx0 = jnp.clip(x_lo >> 3, 0, nb - 1)
        qy0 = jnp.clip(y_lo >> 3, 0, nb - 1)
        return ((ce >> 1) * nb + qy0) * nb + qx0

    idxE = np.asarray(jax.block_until_ready(
        pcf_indices(shadow_maps, consts, g["pos_w"])))
    vals, counts = np.unique(idxE[invalid], return_counts=True)
    top = counts.max() / max(invalid.sum(), 1)
    vals_a, counts_a = np.unique(idxE, return_counts=True)
    top_a = counts_a.max() / idxE.size
    print(f"pcf even-table idx: invalid-pixel top-row share {top * 100:.1f}%"
          f", all-pixel top-row share {top_a * 100:.1f}%"
          f", distinct(all) {len(vals_a)}", flush=True)

    swinE = jax.block_until_ready(jax.jit(
        lambda sm: shadows.superwindow_maps_u16(sm[0::2]))(shadow_maps))
    flatE = swinE.reshape(-1, 128)
    idxE_d = jnp.asarray(idxE)

    def g_win(t, i):
        return t[i]

    t_real = amortized(g_win, flatE, idxE_d)
    # spread: invalid pixels redirected uniformly over the whole table
    M = flatE.shape[0]
    hashed = (pix.astype(jnp.uint32) * jnp.uint32(2654435761)
              % jnp.uint32(M)).astype(jnp.int32)
    idx_spread = jnp.where(jnp.asarray(~invalid), idxE_d, hashed)
    t_spr = amortized(g_win, flatE, idx_spread)
    print(f"pcf window gather (one table): real {t_real:7.2f} ms vs "
          f"invalid-spread {t_spr:7.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
