"""Alpha-tested layer: main-view holes, shadow holes, depth peeling.

Covers the ALPHA_TEST shader-variant capability
(/root/reference/Shaders/Shadows.hlsl:49-65, Default.hlsl clip) via the
fence_scene A/B pair (same geometry as opaque vs alpha-tested).
"""
import numpy as np
import pytest

from crychic_renderer_tpu.models.scenes_baseline import fence_scene


@pytest.fixture(scope="module")
def fence_pair():
    from crychic_renderer_tpu.app.renderer import Renderer

    scene_on, cfg_on, lights = fence_scene(alpha_test=True)
    scene_off, cfg_off, _ = fence_scene(alpha_test=False)
    img_on = Renderer(scene_on, cfg_on, lights=lights).render_np()
    img_off = Renderer(scene_off, cfg_off, lights=lights).render_np()
    return img_on, img_off


def test_fence_holes_main_view(fence_pair):
    img_on, img_off = fence_pair
    H, W = img_on.shape[:2]
    diff = np.abs(img_on[..., :3] - img_off[..., :3]).max(-1)
    changed = (diff > 0.05)
    # the fence must have punched through somewhere (holes show floor/sky)
    assert changed.mean() > 0.02, changed.mean()
    # but the fence bars still cover pixels: images aren't fully different
    # inside the box's screen footprint
    assert changed.mean() < 0.8, changed.mean()
    # far corners (outside fence + outside its shadow) identical
    np.testing.assert_allclose(img_on[:4, :4], img_off[:4, :4], atol=1e-5)


def test_fence_shadow_holes(fence_pair):
    img_on, img_off = fence_pair
    H, W = img_on.shape[:2]
    # floor band in the lower half, away from the fence itself: light
    # comes from +x+z, so the shadow falls toward -x-z of the box center.
    # Compare overall brightness: punching holes can only ADD light.
    floor_on = img_on[2 * H // 3:, :, :3]
    floor_off = img_off[2 * H // 3:, :, :3]
    gain = (floor_on - floor_off).mean()
    assert gain > 0.005, gain
    # and some floor pixels must still be shadowed identically (bars)
    still_dark = (np.abs(floor_on - floor_off).max(-1) < 0.02)
    assert still_dark.mean() > 0.1


def test_alpha_peel_recovers_back_layer():
    """A box's BACK face is visible through front-face holes only with a
    second peel: peels=1 vs 2 must differ where a front hole lands on a
    back bar."""
    from crychic_renderer_tpu.app.renderer import Renderer
    import dataclasses

    scene, cfg, lights = fence_scene(alpha_test=True)
    img2 = Renderer(scene, cfg, lights=lights).render_np()
    cfg1 = dataclasses.replace(cfg, alpha_peels=1)
    img1 = Renderer(scene, cfg1, lights=lights).render_np()
    diff = np.abs(img2[..., :3] - img1[..., :3]).max(-1)
    assert (diff > 0.05).sum() > 20


def test_fence_golden(fence_pair):
    """Committed golden pins the alpha-tested frame (holes + punched
    shadows) against regressions. Regenerate deliberately with
    GOLDEN_UPDATE=1."""
    import os
    import pathlib

    img_on, _ = fence_pair
    img8 = (np.clip(img_on, 0, 1) * 255 + 0.5).astype(np.uint8)
    path = pathlib.Path(__file__).parent / "goldens" / "fence_480x270.npy"
    if os.environ.get("GOLDEN_UPDATE") or not path.exists():
        path.parent.mkdir(exist_ok=True)
        np.save(path, img8)
        pytest.skip(f"golden written to {path}")
    ref = np.load(path)
    diff = np.abs(img8.astype(np.int16) - ref.astype(np.int16))
    frac_visible = (diff > 5).mean()
    assert frac_visible < 0.005, (
        f"{frac_visible:.4%} of pixels moved >2% vs fence golden "
        f"(max {diff.max()}); if intentional, GOLDEN_UPDATE=1")
