"""App-layer tests: interactive viewer loop (scripted/headless)."""
import numpy as np


def test_viewer_scripted_loop(tmp_path):
    """The viewer's frame loop renders, applies WASD/turn keys with the
    reference's speeds, and writes screenshots on 'p'."""
    from crychic_renderer_tpu.app import viewer

    out = str(tmp_path / "shot.png")
    frames = viewer.main([
        "--config", "1", "--small", "--script", "wwlp", "--no-draw",
        "--out", out,
    ])
    assert frames == 4
    import os

    assert os.path.exists(out)


def test_apply_keys_reference_semantics():
    """W walks +10*dt along look; l rotates about world Y (Camera.RotateY);
    q stops the loop."""
    from crychic_renderer_tpu.app.viewer import apply_keys, WALK_SPEED
    from crychic_renderer_tpu.models.camera import Camera

    cam = Camera()
    cam.set_position(0.0, 2.0, -15.0)
    cam.set_lens(0.25 * np.pi, 4 / 3, 1.0, 100.0)
    look0 = cam.look.copy()
    pos0 = cam.position.copy()
    assert apply_keys(cam, "w", dt=0.5)
    np.testing.assert_allclose(cam.position,
                               pos0 + 0.5 * WALK_SPEED * look0, atol=1e-6)
    assert apply_keys(cam, "l", dt=0.1)
    assert not np.allclose(cam.look, look0)
    assert abs(np.dot(cam.right, cam.up)) < 1e-5  # basis re-orthonormalized
    assert not apply_keys(cam, "q", dt=0.1)


def test_viewer_pause_freezes_total_time():
    """Space toggles GameTimer stop/start: animated-texture time freezes
    while paused (the reference's WM_ACTIVATE pause)."""
    import time

    from crychic_renderer_tpu.utils.gametimer import GameTimer

    t = GameTimer()
    t.reset()
    time.sleep(0.05)
    tick_at = time.perf_counter()
    t.tick()
    t0 = t.total_time()
    t.stop()
    stop_at = time.perf_counter()
    time.sleep(0.05)
    t.tick()
    # frozen while stopped (total may include the tick->stop call gap,
    # which can stretch under load — bound by the measured wall clock,
    # NOT a fixed constant: the 0.05 s slept while stopped must be gone)
    frozen = t.total_time()
    assert t0 <= frozen + 1e-9
    assert frozen - t0 <= stop_at - tick_at + 1e-3
    before_start = time.perf_counter()
    t.start()
    time.sleep(0.02)
    t.tick()
    after_tick = time.perf_counter()
    assert t.total_time() > frozen  # running again
    # paused span excluded: only the measured running span accrued
    assert t.total_time() <= frozen + (after_tick - before_start) + 1e-6


def test_viewer_scripted_pause_key():
    from crychic_renderer_tpu.app import viewer

    frames = viewer.main([
        "--config", "1", "--small", "--script", "w w", "--no-draw",
    ])
    assert frames == 3


def test_viewer_step_fn_display_and_capacity():
    """viewer_step_fn returns a display-sized uint8 image (the tiny
    transfer the pipelined viewer fetches) plus the frame's EXACT pair
    counts (same numbers as capacity_requirements) — the overflow guard
    the viewer raises from."""
    import numpy as np
    from crychic_renderer_tpu.config import RenderConfig
    from crychic_renderer_tpu.app.renderer import Renderer
    from crychic_renderer_tpu.models import geometry as gg
    from crychic_renderer_tpu.models.materials import Material
    from crychic_renderer_tpu.models.scene import LAYER_OPAQUE, make_item
    from crychic_renderer_tpu.models.scenes_baseline import _scene_from_items
    from crychic_renderer_tpu.utils import mathutil as mu

    mats = [Material("m", 0, 0, 1, (1, 1, 1, 1), (0.1, 0.1, 0.1), 0.4)]
    items = [make_item("box", gg.create_box(2, 2, 2, 0), LAYER_OPAQUE,
                       mu.translation(0.0, 1.0, 0.0))]
    scene = _scene_from_items(items, mats, [
        "white1x1", "default_nmap", "white1x1", "default_nmap",
        "white1x1", "default_nmap", "sky_cube", "default_nmap",
        "white1x1", "white1x1"])
    r = Renderer(scene, RenderConfig(
        width=128, height=64, shadow_map_size=128,
        ssao_enabled=True, shadows_enabled=True))
    step = r.viewer_step_fn(16, 32)
    disp, mp, sp = step(r.device_scene, r.frame_constants(0.0))
    assert disp.shape == (16, 32, 3) and str(disp.dtype) == "uint8"
    req = r.capacity_requirements(0.0)
    assert int(mp) == req["main_pairs"]
    assert int(sp) == req["shadow_pairs"]
    assert int(mp) <= r.cfg.pair_capacity  # auto-sized with headroom
    # the display image matches the full render downsampled
    full = np.asarray(r.render(0.0))
    ys = np.linspace(0, 63, 16).astype(int)
    xs = np.linspace(0, 127, 32).astype(int)
    want = (np.clip(full[ys][:, xs, :3], 0, 1) * 255 + 0.5).astype(np.uint8)
    assert np.abs(np.asarray(disp).astype(int) - want.astype(int)).max() <= 1

    # shadows disabled -> no shadow raster exists to overflow: the probe
    # reports 0 (and skips the dead 4-cascade setup in the jitted step)
    # instead of sizing a guard for a pass that never runs
    r2 = Renderer(scene, RenderConfig(
        width=128, height=64, shadow_map_size=128,
        ssao_enabled=False, shadows_enabled=False))
    _, mp2, sp2 = r2.viewer_step_fn(16, 32)(
        r2.device_scene, r2.frame_constants(0.0))
    assert int(sp2) == 0 and int(mp2) > 0
