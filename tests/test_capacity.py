"""Rasterizer capacity guards: auto-sizing + overflow detection
(VERDICT r1 item 6 — no more silent triangle drops)."""
import dataclasses

import pytest

from crychic_renderer_tpu.config import RenderConfig
from crychic_renderer_tpu.models.scene import build_cascade_scene
from crychic_renderer_tpu.app.renderer import Renderer


def _cfg(**kw):
    base = dict(width=256, height=128, shadow_map_size=128,
                pair_capacity=1 << 16, bin_cap=256,
                shadow_pair_capacity=1 << 16, shadow_bin_cap=256,
                use_pallas=False, ssao_enabled=False)
    base.update(kw)
    return RenderConfig(**base)


def test_autosize_covers_requirements():
    r = Renderer(build_cascade_scene(), _cfg())
    req = r.check_capacity(0.0)  # must not raise
    assert r.cfg.pair_capacity >= 2 * req["main_pairs"]
    assert r.cfg.shadow_pair_capacity >= 2 * req["shadow_pairs"]
    assert r.cfg.bin_cap >= req["main_max_tile"]


def test_overflow_raises_instead_of_silent_drop():
    r = Renderer(build_cascade_scene(), _cfg(pair_capacity=16),
                 auto_capacity=False)
    with pytest.raises(RuntimeError, match="overflow"):
        r.check_capacity(0.0)


def test_shadow_overflow_raises():
    r = Renderer(build_cascade_scene(), _cfg(shadow_pair_capacity=16),
                 auto_capacity=False)
    with pytest.raises(RuntimeError, match="shadow raster overflow"):
        r.check_capacity(0.0)


def test_shade_tiles_count_alpha_layer():
    """alpha_merge_main sets tid >= 0 in tiles no OPAQUE bbox touches
    (fence bars against sky), so shade-tile occupancy must include the
    AT layer's bboxes — else the compacted resolve clear-fills covered
    alpha pixels without tripping check_capacity (ADVICE r4 high)."""
    import functools

    import jax

    from crychic_renderer_tpu.models.scenes_baseline import fence_scene
    from crychic_renderer_tpu.passes import frame as fr

    scene, cfg, lights = fence_scene(alpha_test=True)
    r = Renderer(scene, cfg, lights=lights)
    # look UP at the fence so its bars land on pure-sky tiles the floor's
    # bboxes never touch
    r.camera.look_at((0.0, 2.0, -14.0), (0.0, 6.0, 0.0), (0.0, 1.0, 0.0))
    consts = r.frame_constants(0.0)
    req = jax.jit(functools.partial(
        fr.capacity_requirements, cfg=r.cfg))(r.device_scene, consts)
    cfg_off = dataclasses.replace(r.cfg, alpha_test_enabled=False)
    req_off = jax.jit(functools.partial(
        fr.capacity_requirements, cfg=cfg_off))(r.device_scene, consts)
    assert int(req["shade_tiles"]) > int(req_off["shade_tiles"]), (
        int(req["shade_tiles"]), int(req_off["shade_tiles"]))
