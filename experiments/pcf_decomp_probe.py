"""Decompose the 73 ms PCF stage and the 73 ms resolve stage (amortized
timings, real config-5 frame data).

hot_row_probe showed the PCF window gathers cost only ~6.7 ms/table with
the real indices — so most of the PCF stage must be VPU tent math. This
probe splits cascade_shadow_factor into: superwindow build | projections
+ select | + gathers + cmp (tents replaced by constant weights) | full.
And for resolve: record gather with the current hot row-0 clamp vs
value-identical duplicated-pad-row spread, and the aniso sampling with
real inputs vs invalid pixels redirected to spread mip-0 rows.

Run ON THE TPU: python -m experiments.pcf_decomp_probe
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
from crychic_renderer_tpu.ops import shadows, sampling, raster_pallas as rp
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
    S = cfgr.shadow_map_size

    @jax.jit
    def front(sc, consts):
        tris, tri_attr = fr.main_view_tris(sc, consts, cfgr)
        depth, tid = rp.rasterize_pallas(tris, W, H, cfgr.pair_capacity)
        return tris, tri_attr, depth, tid

    tris, tri_attr, depth, tid = jax.block_until_ready(front(sc, consts))
    g = jax.block_until_ready(jax.jit(
        lambda sc, consts, tris, depth, tid, ta: fr.resolve_gbuffer(
            sc, consts, cfgr, tris, depth, tid, ta))(
                sc, consts, tris, depth, tid, tri_attr))
    shadow_maps = jax.block_until_ready(jax.jit(
        lambda sc, consts: fr.render_shadow_maps(sc, consts, cfgr))(
            sc, consts))
    pos_w = g["pos_w"]

    # --- PCF decomposition ----------------------------------------------
    def build_only(sm):
        return (shadows.superwindow_maps_u16(sm[0::2]),
                shadows.superwindow_maps_u16(sm[1::2]))

    t_build = amortized(build_only, shadow_maps)

    from crychic_renderer_tpu.models.cascades import CASCADE_RADII
    from crychic_renderer_tpu.ops.shading import rowmat

    def proj_select(consts, pos_w):
        radii = jnp.asarray(CASCADE_RADII)
        dist = jnp.sqrt(((consts.eye_pos - pos_w) ** 2).sum(-1))
        past = (dist[..., None] >= radii[None, None, :]).sum(-1)
        c = jnp.clip(past, 0, 3).astype(jnp.int32)
        ph = jnp.concatenate([pos_w, jnp.ones_like(pos_w[..., :1])], -1)
        all_pos = jnp.stack([rowmat(ph, consts.shadow_transforms[ci])
                             for ci in range(4)])
        even = (c & 1) == 0
        ce = jnp.where(even, c, jnp.minimum(c + 1, 2))
        co = jnp.where(even, c + 1, c)

        def sp(ci):
            sel = (jnp.arange(4)[:, None, None, None] == ci[None, ..., None])
            return (all_pos * sel.astype(all_pos.dtype)).sum(0)

        return c, ce, co, sp(ce), sp(co)

    t_proj = amortized(proj_select, consts, pos_w)

    def gathers_cmp(sm, consts, pos_w):
        swin_e = shadows.superwindow_maps_u16(sm[0::2])
        swin_o = shadows.superwindow_maps_u16(sm[1::2])
        c, ce, co, spe, spo = proj_select(consts, pos_w)
        nb = swin_e.shape[1]

        def one(swin, casc, spos):
            inv_w = 1.0 / jnp.maximum(spos[..., 3], 1e-20)
            u = spos[..., 0] * inv_w
            v = spos[..., 1] * inv_w
            d = spos[..., 2] * inv_w
            x_lo = jnp.floor(u * S - 0.5).astype(jnp.int32) - 3
            y_lo = jnp.floor(v * S - 0.5).astype(jnp.int32) - 3
            qx0 = jnp.clip(x_lo >> 3, 0, nb - 1)
            qy0 = jnp.clip(y_lo >> 3, 0, nb - 1)
            flat = swin.reshape(-1, swin.shape[-1])
            idx = (casc * nb + qy0) * nb + qx0
            win = flat[idx]
            w16 = shadows._unpack_u16_window(win)
            dq = d[..., None] * 65535.0 - 0.5
            return (dq <= w16).astype(jnp.float32).mean(-1)

        return one(swin_e, ce >> 1, spe) + one(swin_o, co >> 1, spo)

    t_gcmp = amortized(gathers_cmp, shadow_maps, consts, pos_w)

    def full_pcf(sm, consts, pos_w):
        return shadows.cascade_shadow_factor(
            sm, consts.shadow_transforms, pos_w, consts.eye_pos, S,
            deferred_blend_quirk=True)

    t_full = amortized(full_pcf, shadow_maps, consts, pos_w)

    print(f"pcf: build {t_build:6.2f} | proj+select {t_proj:6.2f} | "
          f"build+proj+gather+cmp {t_gcmp:6.2f} | full {t_full:6.2f} "
          f"(tents ~= {t_full - t_gcmp:6.2f})", flush=True)

    # --- resolve: record spread + aniso redirect -------------------------
    valid = tid >= 0
    invalid_frac = float((~np.asarray(valid)).mean())

    pairidx = jax.block_until_ready(jax.jit(
        lambda sc: fr._mat_select(
            sc.mat_pair,
            jnp.zeros((H, W), jnp.int32)))(sc))  # warm only

    # real aniso inputs from the resolved g (recompute uv/duv/mat the way
    # resolve does)
    @jax.jit
    def uv_mat(sc, tris, tid, ta):
        safe_tid = jnp.maximum(tid, 0)
        a = ta[:, :, 4:]
        rec = jnp.concatenate([
            tris.xy.reshape(-1, 6), tris.inv_w,
            a[:, 0, 0:3], a[:, 1, 0:3], a[:, 2, 0:3],
            a[:, 0, 3:6], a[:, 1, 3:6], a[:, 2, 3:6],
            a[:, 0, 6:9], a[:, 1, 6:9], a[:, 2, 6:9],
            a[:, 0, 9:11], a[:, 1, 9:11], a[:, 2, 9:11],
            a[:, 0, 11:12]], axis=-1)
        rec = jnp.pad(rec, ((0, 0), (0, 64 - rec.shape[1])))
        r_ = rec[safe_tid]
        from crychic_renderer_tpu.ops import rasterizer as rz
        xy = r_[..., :6].reshape(H, W, 3, 2)
        inv_w = r_[..., 6:9]
        px = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :].repeat(H, 0)
        py = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None].repeat(W, 1)
        b = rz.barycentrics_at(xy, px, py)
        wgt = b * inv_w
        den = wgt.sum(-1, keepdims=True)
        wgt = wgt / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        uv = (wgt[..., 0:1] * r_[..., 36:38] + wgt[..., 1:2] * r_[..., 38:40]
              + wgt[..., 2:3] * r_[..., 40:42])
        mat = r_[..., 42].astype(jnp.int32)
        return uv, mat

    pix_uv, mat = jax.block_until_ready(uv_mat(sc, tris, tid, tri_attr))

    def aniso_real(sc, uv, mat):
        pairidx = fr._mat_select(sc.mat_pair, mat)
        dx, dy = sampling.uv_derivatives(uv)
        return sampling.sample_pair_aniso(sc.pair_pool, pairidx, uv, dx, dy,
                                          cfgr.anisotropy,
                                          probes=cfgr.aniso_probes)

    t_aniso = amortized(aniso_real, sc, pix_uv, mat)

    def aniso_redirect(sc, uv, mat, valid):
        pairidx = fr._mat_select(sc.mat_pair, mat)
        dx, dy = sampling.uv_derivatives(uv)
        # redirect invalid pixels AFTER derivatives: spread screen uv at
        # lod 0 of pair 0
        v3 = valid[..., None]
        uu = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
        vv = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        sp = jnp.stack([jnp.broadcast_to(uu[None, :], (H, W)),
                        jnp.broadcast_to(vv[:, None], (H, W))], -1)
        uv2 = jnp.where(v3, uv, sp)
        z = jnp.full((H, W, 2), 1.0 / 512.0, jnp.float32)
        dx2 = jnp.where(v3, dx, z)
        dy2 = jnp.where(v3, dy, z)
        pair2 = jnp.where(valid, pairidx, 0)
        return sampling.sample_pair_aniso(sc.pair_pool, pair2, uv2, dx2, dy2,
                                          cfgr.anisotropy,
                                          probes=cfgr.aniso_probes)

    t_aniso_r = amortized(aniso_redirect, sc, pix_uv, mat, valid)
    print(f"aniso ({invalid_frac * 100:.0f}% invalid): real {t_aniso:6.2f}"
          f" | invalid-redirected {t_aniso_r:6.2f}", flush=True)


if __name__ == "__main__":
    main()
