"""Sub-pass profiling of the two heaviest passes (lighting, shadow atlas)
on the real TPU: which fraction is gathers vs VPU math vs raster kernel.
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
from crychic_renderer_tpu.ops import shadows, rasterizer as rz
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

    # ---- shadow atlas internals ----
    def shadow_tris(s, c):
        tl = []
        for ci in range(4):
            clip = fr.shadow_clip(s.shadow, c.shadow_visibility,
                                  c.cascade_view_projs[ci])
            tt = rz.setup_triangles(clip, s.shadow.indices, S, S)
            tt = tt._replace(xy=tt.xy + jnp.asarray([ci * S, 0.0]))
            tl.append(tt)
        tris = rz.ScreenTris(
            xy=jnp.concatenate([x.xy for x in tl]),
            z=jnp.concatenate([x.z for x in tl]),
            inv_w=jnp.concatenate([x.inv_w for x in tl]),
            valid=jnp.concatenate([x.valid for x in tl]))
        return fr._shadow_bias(tris)

    print("shadow_setup      %8.2f ms" % t(shadow_tris, sc, consts),
          flush=True)
    tris = jax.jit(shadow_tris)(sc, consts)

    ntx = -(-4 * S // rp.TILE_W)
    nty = -(-S // 32)

    def shadow_bin(tr):
        return rz.bin_triangles(tr, 4 * S, S, cfgr.shadow_pair_capacity,
                                tile_h=32, tile_w=rp.TILE_W)

    print("shadow_bin        %8.2f ms" % t(shadow_bin, tris), flush=True)
    bins = jax.jit(shadow_bin)(tris)

    def shadow_records(tr, b):
        return rp.build_records(tr, b, ntx, ntx * nty, 32)

    print("shadow_records    %8.2f ms" % t(shadow_records, tris, bins),
          flush=True)

    def shadow_kernel_only(tr):
        T1 = tr.xy.shape[0] // 4
        col = jnp.repeat(jnp.arange(4, dtype=jnp.float32), T1)
        xr = (col * S, (col + 1) * S)
        d, _ = rp.rasterize_pallas(tr, 4 * S, S, cfgr.shadow_pair_capacity,
                                   tile_h=32, with_ids=False, xrange=xr)
        return d

    print("shadow_full       %8.2f ms" % t(shadow_kernel_only, tris),
          flush=True)

    # ---- lighting internals ----
    # reproduce frame state up to lighting
    tris_m, tri_attr = fr.main_view_tris(sc, consts, cfgr)
    depth, tid = jax.jit(lambda tr: rp.rasterize_pallas(
        tr, W, H, cfgr.pair_capacity))(tris_m)
    tris_m = tris_m._replace(xy=rp.snap_xy(tris_m.xy))
    g = jax.jit(functools.partial(fr.resolve_gbuffer, cfg=cfgr))(
        sc, consts, tris=tris_m, depth=depth, tid=tid, tri_attr=tri_attr)
    shadow_maps = jax.jit(functools.partial(
        fr.render_shadow_maps, cfg=cfgr))(sc, consts)
    pos_w = g["pos_w"]

    def sw_build(sm):
        return shadows.superwindow_maps_u16(sm)

    print("pcf_table_build   %8.2f ms" % t(sw_build, shadow_maps),
          flush=True)
    swin = jax.jit(sw_build)(shadow_maps)

    def pcf_full(sm, pw):
        return shadows.cascade_shadow_factor(
            sm, consts.shadow_transforms, pw, consts.eye_pos, S,
            deferred_blend_quirk=True)

    print("pcf_factor(x2)    %8.2f ms" % t(pcf_full, shadow_maps, pos_w),
          flush=True)

    # gather-only: fetch both cascades' windows, trivial reduce
    def pcf_gather_only(sw, pw):
        radii = jnp.asarray([30., 50., 80., 100.])
        dist = jnp.sqrt(((consts.eye_pos - pw) ** 2).sum(-1))
        past = (dist[..., None] >= radii).sum(-1).astype(jnp.int32)
        c = jnp.clip(past, 0, 3)
        ph = jnp.concatenate([pw, jnp.ones_like(pw[..., :1])], -1)
        all_pos = jnp.einsum("...i,cij->c...j", ph, consts.shadow_transforms)
        out = 0.
        nb = sw.shape[1]
        flat = sw.reshape(-1, sw.shape[-1])
        for cc in (c, jnp.minimum(c + 1, 3)):
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
            out = out + flat[idx].astype(jnp.float32).sum(-1)
        return out

    print("pcf_gather_only   %8.2f ms" % t(pcf_gather_only, swin, pos_w),
          flush=True)

    # lighting without shadows and without sky
    import dataclasses
    cfg_nosh = dataclasses.replace(cfgr, shadows_enabled=False,
                                   sky_enabled=False)

    def light_core(s, gg, aa, d):
        return fr.lighting_pass(s, consts, cfg_nosh, gg, shadow_maps, aa, d)

    amb = jnp.ones((H, W), jnp.float32)
    print("light_pbr_only    %8.2f ms" % t(light_core, sc, g, amb, depth),
          flush=True)

    cfg_skyonly = dataclasses.replace(cfgr, shadows_enabled=False)

    def light_sky(s, gg, aa, d):
        return fr.lighting_pass(s, consts, cfg_skyonly, gg, shadow_maps,
                                aa, d)

    print("light_pbr+sky     %8.2f ms" % t(light_sky, sc, g, amb, depth),
          flush=True)

    # resolve internals: rec gather only vs full
    def resolve_gather_only(s, tid_):
        a = tri_attr[:, :, 4:]
        rec = jnp.concatenate([
            tris_m.xy.reshape(-1, 6), tris_m.inv_w,
            a[:, 0, 0:3], a[:, 1, 0:3], a[:, 2, 0:3],
            a[:, 0, 3:6], a[:, 1, 3:6], a[:, 2, 3:6],
            a[:, 0, 6:9], a[:, 1, 6:9], a[:, 2, 6:9],
            a[:, 0, 9:11], a[:, 1, 9:11], a[:, 2, 9:11],
            a[:, 0, 11:12],
        ], axis=-1)
        rec = jnp.pad(rec, ((0, 0), (0, 64 - rec.shape[1])))
        return rec[jnp.maximum(tid_, 0)].sum(-1)

    print("resolve_rec_gather%8.2f ms" % t(resolve_gather_only, sc, tid),
          flush=True)

    # texture sampling alone (aniso 4 probes at constant pair/lod)
    from crychic_renderer_tpu.ops import sampling

    uv = g["pos_w"][..., :2] * 0.1  # arbitrary smooth uv field
    pool = sc.pair_pool
    pairidx = jnp.zeros((H, W), jnp.int32)

    def tex_aniso(u):
        dx, dy = sampling.uv_derivatives(u)
        d_, n_ = sampling.sample_pair_aniso(pool, pairidx, u, dx, dy, 8, 4)
        return d_ + n_

    print("tex_aniso4        %8.2f ms" % t(tex_aniso, uv), flush=True)

    def tex_tri(u):
        dx, dy = sampling.uv_derivatives(u)
        lod = sampling.lod_from_derivatives(dx, dy)
        d_, n_ = sampling.sample_pair_trilinear(pool, pairidx, u, lod)
        return d_ + n_

    print("tex_trilinear     %8.2f ms" % t(tex_tri, uv), flush=True)


if __name__ == "__main__":
    main()
