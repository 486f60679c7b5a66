"""Stage-level breakdown of the per-device band program.

sharded_band_timing.py measures the whole band; this splits it at the
same boundaries as app/profiler.py does for the single-chip frame, so the
residual per-device BASE (the terms that do not shrink with n_dev) can be
attributed: replicated vertex/setup work, simulated all_gather receive
materialization, per-triangle resolve prep, blur/lighting tails.

Run ON THE TPU:
    python -m experiments.band_stage_profile --config 5 --n-dev 8 32
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--n-dev", type=int, nargs="+", default=[8])
    ap.add_argument("--band", type=int, default=None,
                    help="device index to profile (default n//2)")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--sub", action="store_true",
                    help="also time sub-stages of the flat base terms "
                         "(front-end pieces, shadow setup, superwindow)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from crychic_renderer_tpu.models.scenes_baseline import CONFIGS
    from crychic_renderer_tpu.app.renderer import Renderer
    from crychic_renderer_tpu.parallel import sharded
    from crychic_renderer_tpu.passes import frame as fr
    from crychic_renderer_tpu.ops import raster_pallas as rp

    def timed(fn, *a, reps=args.reps, **k):
        def scalarized(*aa, **kk):
            leaves = jax.tree_util.tree_leaves(fn(*aa, **kk))
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        g = jax.jit(scalarized)
        _ = float(g(*a, **k))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = g(*a, **k)
        _ = float(out)
        return (time.perf_counter() - t0) / reps * 1000.0

    scene0, cfg0, lights = CONFIGS[args.config]()
    if args.small:
        cfg0 = dataclasses.replace(cfg0, width=cfg0.width // 4,
                                   height=cfg0.height // 4,
                                   shadow_map_size=cfg0.shadow_map_size // 4)
    if jax.default_backend() == "cpu" and cfg0.use_pallas:
        cfg0 = dataclasses.replace(cfg0, pallas_interpret=True)
    r = Renderer(scene0, cfg0, lights=lights)
    cfg = r.cfg
    consts = r.frame_constants(0.0)
    report = {"config": args.config, "n_dev": {}}

    for n in args.n_dev:
        d = args.band if args.band is not None else n // 2
        band_h = sharded.band_height(cfg, n)
        H_pad = band_h * n
        W = cfg.width
        scene = r.device_scene
        cfg_n = sharded.autosize_band_capacities(scene, consts, cfg, n)
        if cfg.ssao_enabled:
            need = H_pad // cfg.ssao_scale
            if scene.ssao_random_field.shape[0] < need:
                scene = dataclasses.replace(
                    scene, ssao_random_field=sharded._pad_rows(
                        scene.ssao_random_field, need))
        comm = sharded._Comm("sp", n, sim_index=d)

        class _Live(dict):
            """Print each stage as it lands (late failures keep results)."""

            def __setitem__(self, k, v):
                print(f"  {k}: "
                      f"{round(v, 2) if isinstance(v, float) else v}",
                      flush=True)
                super().__setitem__(k, v)

        rep = _Live({"band_h": band_h, "d": d})

        # match _band_render's production gate: the Pallas path ships the
        # atlas u16-packed when no f32 consumer remains
        packed = (cfg_n.use_pallas
                  and not (cfg_n.alpha_test_enabled
                           and r.device_scene.alpha is not None)
                  and cfg_n.deferred and cfg_n.debug_view is None)

        def shadow_fn(s, c):
            return sharded._band_shadow_maps(s, c, cfg_n, comm,
                                             comm.index(), packed=packed)

        rep["shadow_band"] = timed(shadow_fn, scene, consts)
        shadow_maps = jax.jit(shadow_fn)(scene, consts)

        def front_fn(s, c):
            return sharded._band_main_view_tris(s, c, cfg_n, comm,
                                                comm.index())

        rep["front_end"] = timed(front_fn, scene, consts)
        tris, tri_attr = jax.jit(front_fn)(scene, consts)

        if args.sub:
            import numpy as np
            from crychic_renderer_tpu.ops import clipping, shadows
            from crychic_renderer_tpu.ops import rasterizer as rz

            def vs_fn(s, c):
                return fr.vertex_stage(s.opaque, c.opaque_visibility,
                                       c.view_proj, s.mat_transform)

            rep["sub_vertex_stage"] = timed(vs_fn, scene, consts)

            def vrec_fn(s, c):
                return fr.vertex_records(s.opaque, *vs_fn(s, c))

            rep["sub_vertex_records"] = timed(vrec_fn, scene, consts)
            vrec = jax.jit(vrec_fn)(scene, consts)
            tri_idx = jnp.asarray(
                np.asarray(scene.opaque.indices).reshape(-1, 3))
            T = tri_idx.shape[0]
            k_t = -(-T // n)
            idx_p = jnp.pad(tri_idx, ((0, n * k_t - T), (0, 0)))

            def chunkclip_fn(vr, ip):
                chunk = jax.lax.dynamic_slice_in_dim(ip, d * k_t, k_t,
                                                     axis=0)
                a = vr[chunk]
                valid0 = (d * k_t
                          + jnp.arange(k_t, dtype=jnp.int32)) < T
                return clipping.clip_near(a, valid0)

            rep["sub_chunk_clip"] = timed(chunkclip_fn, vrec, idx_p)
            a2, valid = jax.jit(chunkclip_fn)(vrec, idx_p)

            def gather_reasm_fn(a2_, valid_):
                g = comm.all_gather(a2_)
                gv = comm.all_gather(valid_)
                tri_attr_ = jnp.concatenate([
                    g[:, :k_t].reshape(n * k_t, 3, 16)[:T],
                    g[:, k_t:].reshape(n * k_t, 3, 16)[:T]])
                tri_valid_ = jnp.concatenate(
                    [gv[:, :k_t].reshape(n * k_t)[:T],
                     gv[:, k_t:].reshape(n * k_t)[:T]])
                return tri_attr_, tri_valid_

            rep["sub_gather_reasm"] = timed(gather_reasm_fn, a2, valid)
            tri_attr_s, tri_valid_s = jax.jit(gather_reasm_fn)(a2, valid)

            def setup_fn(ta, tv):
                return rz.setup_tri_verts(ta[..., :4], tv,
                                          cfg.width, cfg.height)

            rep["sub_setup_tri_verts"] = timed(setup_fn, tri_attr_s,
                                               tri_valid_s)

            def stw_fn(s, c):
                return sharded._band_shadow_tri_world(
                    s, c.shadow_visibility, comm, comm.index())

            rep["sub_shadow_tri_world"] = timed(stw_fn, scene, consts)
            tri_world = jax.jit(stw_fn)(scene, consts)

            def satris_fn(s, c, tw):
                return fr.shadow_atlas_tris(
                    s, c.shadow_visibility, c.cascade_view_projs, cfg_n,
                    tri_world=tw)

            rep["sub_shadow_atlas_setup"] = timed(satris_fn, scene,
                                                  consts, tri_world)

            def swin_fn(sm):
                # the packed atlas exchange already ships u16 texel-pairs;
                # downstream builds superwindows straight from them
                if sm.dtype == jnp.uint32:
                    return shadows.superwindow_from_packed(sm)
                return shadows.superwindow_maps_u16(sm)

            rep["sub_superwindow_u16"] = timed(swin_fn, shadow_maps)

            # ---- shadow_band internals (Pallas path) ----
            if cfg_n.use_pallas and cfg_n.shadows_enabled:
                S = cfg_n.shadow_map_size
                C = cfg_n.num_cascades
                scap = sharded._shadow_band_cap(cfg_n)

                def ssetup_fn(s, c):
                    return sharded._band_shadow_atlas_tris(
                        s, c, cfg_n, comm, comm.index())

                rep["sub_shadow_setup_sharded"] = timed(ssetup_fn, scene,
                                                        consts)
                stris, sxrange = jax.jit(ssetup_fn)(scene, consts)

                def sbin_fn(tr):
                    return rz.bin_triangles(tr, C * S, S, scap,
                                            tile_h=fr.SHADOW_TILE_H,
                                            tile_w=rp.TILE_W,
                                            row_stride=(n, d))

                rep["sub_shadow_bin"] = timed(sbin_fn, stris)

                def sraster_fn(tr):
                    return rp.rasterize_pallas(
                        tr, C * S, S, scap, tile_h=fr.SHADOW_TILE_H,
                        with_ids=False, interpret=cfg_n.pallas_interpret,
                        xrange=sxrange, tiles_per_prog=32,
                        row_stride=(n, d))

                rep["sub_shadow_bin_raster"] = timed(sraster_fn, stris)
                sdepth, _ = jax.jit(sraster_fn)(stris)

                def sexch_fn(depth):
                    w = C * S
                    if packed:
                        depth = shadows.pack_depth_rows_u16(depth)
                        w = C * S // 2
                    g = comm.all_gather(depth)
                    nty_s = -(-S // fr.SHADOW_TILE_H)
                    rpd_s = -(-nty_s // n)
                    full = g.reshape(n, rpd_s, fr.SHADOW_TILE_H,
                                     w).transpose(1, 0, 2, 3).reshape(
                                         n * rpd_s * fr.SHADOW_TILE_H,
                                         w)[:S]
                    cw = w // C
                    return jnp.stack(
                        [full[:, c * cw:(c + 1) * cw] for c in range(C)])

                rep["sub_shadow_pack_exchange"] = timed(sexch_fn, sdepth)

        cap = sharded._main_band_cap(cfg_n)

        def raster_fn(tr):
            return rp.rasterize_pallas(tr, W, H_pad, cap,
                                       interpret=cfg_n.pallas_interpret,
                                       row_stride=(n, d))

        rep["raster_band"] = timed(raster_fn, tris)
        dpart, tpart = jax.jit(raster_fn)(tris)

        tile_h = rp.TILE_H
        nty = -(-H_pad // tile_h)
        rpd = -(-nty // n)

        def reassemble_fn(dp, tp):
            def one(part):
                g = comm.all_gather(part)
                full = g.reshape(n, rpd, tile_h, W).transpose(
                    1, 0, 2, 3).reshape(n * rpd * tile_h, W)
                full = jnp.concatenate([full, full[-1:]], axis=0)
                return jax.lax.dynamic_slice_in_dim(
                    full, d * band_h, band_h + 1, axis=0)

            return one(dp), one(tp)

        rep["reassemble"] = timed(reassemble_fn, dpart, tpart)
        depth, tid = jax.jit(reassemble_fn)(dpart, tpart)

        band_cfg = dataclasses.replace(cfg_n, height=band_h)

        def resolve_fn(s, c, dep, t, tr, ta):
            return fr.resolve_gbuffer(s, c, band_cfg, tr, dep, t, ta,
                                      row_offset=jnp.int32(d * band_h),
                                      full_height=cfg.height,
                                      out_rows=band_h)

        rep["resolve_band"] = timed(resolve_fn, scene, consts, depth, tid,
                                    tris, tri_attr)
        g = jax.jit(resolve_fn)(scene, consts, depth, tid, tris, tri_attr)
        depth_b = depth[:band_h]

        if cfg.ssao_enabled:
            def ssao_fn(s, c, nv, dep):
                return sharded._band_ssao(s, c, cfg_n, nv, dep, comm,
                                          comm.index(), band_h)

            rep["ssao_band"] = timed(ssao_fn, scene, consts,
                                     g["normal_v"], depth_b)
            access = jax.jit(ssao_fn)(scene, consts, g["normal_v"],
                                      depth_b)
        else:
            access = jnp.ones((band_h, W), jnp.float32)

        def light_fn(s, c, gg, sm, acc, dep):
            return fr.lighting_pass(
                s, c, band_cfg, gg, sm, acc, dep,
                row_offset=jnp.float32(d * band_h),
                full_height=cfg.height)

        rep["lighting_band"] = timed(light_fn, scene, consts, g,
                                     shadow_maps, access, depth_b)

        def total_fn(s, c):
            return sharded._band_render(s, c, cfg_n, comm, band_h)

        rep["TOTAL_fused"] = timed(total_fn, scene, consts)
        rep = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in rep.items()}
        report["n_dev"][n] = rep
        print(json.dumps({n: rep}), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
