"""Fuzz parity: random camera poses through BOTH rasterizer back ends.

The committed goldens pin five fixed viewpoints; this fuzzes the
viewpoint axis — random walk/strafe/pitch/yaw sequences over the full
cascade scene (config 4 content at 1/8 scale) must render identically
through the Pallas streaming kernel (interpret mode) and the pure-XLA
rasterizer. Both paths snap vertices identically, so any visible
disagreement beyond fp edge rounding is a binning/clipping/capacity bug
that the fixed-camera goldens cannot see (e.g. a tile-boundary case that
only a particular frustum hits).

Camera perturbations stay within the capacity autosizing's 1.5x headroom
(checked explicitly via Renderer.check_capacity, so a pose that would
overflow FAILS loudly rather than silently truncating one path).
"""
import dataclasses

import numpy as np
import pytest

from crychic_renderer_tpu.models.scenes_baseline import CONFIGS


def _apply_pose(cam, rng):
    """A modest random pose: the viewer's own key semantics, bounded so
    the pair load stays inside the sized capacities."""
    cam.walk(float(rng.uniform(-3.0, 3.0)))
    cam.strafe(float(rng.uniform(-3.0, 3.0)))
    cam.rotate_y(float(rng.uniform(-0.4, 0.4)))
    cam.pitch(float(rng.uniform(-0.15, 0.15)))
    cam.update_view_matrix()


@pytest.fixture(scope="module")
def renderer_pair():
    from crychic_renderer_tpu.app.renderer import Renderer

    scene, cfg, lights = CONFIGS[4]()
    cfg = dataclasses.replace(
        cfg, width=cfg.width // 8, height=cfg.height // 8,
        shadow_map_size=max(cfg.shadow_map_size // 8, 128))
    r_xla = Renderer(scene, dataclasses.replace(cfg, use_pallas=False),
                     lights=lights)
    r_pl = Renderer(scene, cfg, lights=lights)
    # Renderer downgrades use_pallas on CPU backends; interpret mode runs
    # the kernel logic anywhere. Re-autosize at the kernel's 8-row tiles,
    # then REBUILD the jitted frame fn — __init__ already bound it with
    # the downgraded cfg, so without this the fixture would silently
    # compare XLA against XLA (found by review).
    r_pl.cfg = dataclasses.replace(r_pl.cfg, use_pallas=True,
                                   pallas_interpret=True)
    r_pl._autosize_capacity()
    r_pl.rebind_frame_fn()
    return r_xla, r_pl


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_pose_pallas_xla_parity(renderer_pair, seed):
    r_xla, r_pl = renderer_pair
    rng = np.random.default_rng(seed)
    _apply_pose(r_xla.camera, np.random.default_rng(seed))
    _apply_pose(r_pl.camera, np.random.default_rng(seed))
    # the pose must be inside both paths' sized capacities (else the
    # comparison could "pass" on identically-truncated geometry)
    r_xla.check_capacity(0.0)
    r_pl.check_capacity(0.0)
    a = r_xla.render_np(0.0)
    b = r_pl.render_np(0.0)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    diff = np.abs(a - b).max(axis=-1)
    frac = (diff > 0.02).mean()
    assert frac < 0.005, (
        f"seed {seed}: {frac:.4%} of pixels disagree >2% between the "
        f"Pallas and XLA rasterizers (max {diff.max():.4f})")
