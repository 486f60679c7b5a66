"""Static geometry precompute (frame.draw_with_statics).

worlds / tex_transforms / mat_transform never change after scene build
(app/renderer.py only rewrites mat_pair), so the world-space vertex
transforms and the vertex->triangle corner gather are precomputed once.
These tests pin the required BIT-exactness of the fast paths against the
legacy per-vertex pipeline (rowmat commutes with the corner gather; a
triangle's corners share one instance), and that a full frame renders
identically with and without the statics attached.
"""
import dataclasses

import numpy as np
import pytest

from crychic_renderer_tpu.app.renderer import Renderer
from crychic_renderer_tpu.models.scenes_baseline import fence_scene
from crychic_renderer_tpu.passes import frame as fr


def _strip(draw):
    if draw is None:
        return None
    return dataclasses.replace(draw, tri_posw_h=None, tri_instance=None,
                               tri_rest=None)


def _strip_scene(scene):
    return dataclasses.replace(
        scene, opaque=_strip(scene.opaque), shadow=_strip(scene.shadow),
        alpha=_strip(scene.alpha))


@pytest.fixture(scope="module")
def fence_renderer():
    scene, cfg, lights = fence_scene(alpha_test=True)
    return Renderer(scene, cfg, lights=lights)


def test_statics_attached_by_build(fence_renderer):
    sc = fence_renderer.device_scene
    T = sc.opaque.indices.shape[0] // 3
    assert sc.opaque.tri_rest.shape == (T, 3, 12)
    assert sc.opaque.tri_posw_h.shape == (T, 3, 4)
    assert sc.opaque.tri_instance.shape == (T,)
    assert sc.shadow.tri_posw_h is not None
    assert sc.shadow.tri_rest is None  # shadow casting needs positions only
    assert sc.alpha.tri_rest is not None


def test_tri_attrs_fast_bit_exact(fence_renderer):
    sc = fence_renderer.device_scene
    consts = fence_renderer.frame_constants(0.0)
    fast = fr.tri_attrs(sc.opaque, consts.opaque_visibility,
                        consts.view_proj, sc.mat_transform)
    legacy = fr.tri_attrs(_strip(sc.opaque), consts.opaque_visibility,
                          consts.view_proj, sc.mat_transform)
    assert np.array_equal(np.asarray(fast), np.asarray(legacy))


def test_shadow_tri_world_fast_bit_exact(fence_renderer):
    sc = fence_renderer.device_scene
    consts = fence_renderer.frame_constants(0.0)
    fast = fr.shadow_tri_world(sc.shadow, consts.shadow_visibility)
    legacy = fr.shadow_tri_world(_strip(sc.shadow),
                                 consts.shadow_visibility)
    assert np.array_equal(np.asarray(fast), np.asarray(legacy))


def test_alpha_shadow_geom_fast_bit_exact(fence_renderer):
    sc = fence_renderer.device_scene
    consts = fence_renderer.frame_constants(0.0)
    tw_f, uv_f, mat_f = fr.alpha_shadow_geom(sc, consts)
    tw_l, uv_l, mat_l = fr.alpha_shadow_geom(_strip_scene(sc), consts)
    assert np.array_equal(np.asarray(tw_f), np.asarray(tw_l))
    assert np.array_equal(np.asarray(uv_f), np.asarray(uv_l))
    assert np.array_equal(np.asarray(mat_f), np.asarray(mat_l))


def test_full_frame_bit_exact_with_and_without_statics(fence_renderer):
    """render_frame output is identical with the statics stripped (the
    legacy per-vertex path) — culling included (camera visibility 0/1)."""
    sc = fence_renderer.device_scene
    consts = fence_renderer.frame_constants(0.0)
    cfg = fence_renderer.cfg
    img_fast = np.asarray(fr.render_frame(sc, consts, cfg))
    img_legacy = np.asarray(fr.render_frame(_strip_scene(sc), consts, cfg))
    assert np.array_equal(img_fast, img_legacy)
