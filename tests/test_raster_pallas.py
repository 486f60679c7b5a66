import numpy as np
import jax.numpy as jnp
import pytest

from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.ops import raster_pallas as rp


def _random_scene(T=80, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, size=(T, 1, 4)).astype(np.float32)
    verts = (centers + rng.uniform(-0.25, 0.25, size=(T, 3, 4))).astype(
        np.float32).reshape(T * 3, 4)
    verts[:, 2] = rng.uniform(0.01, 0.99, T * 3)
    verts[:, 3] = 1.0
    idx = np.arange(T * 3, dtype=np.int32)
    return jnp.asarray(verts), jnp.asarray(idx)


def test_pallas_matches_brute_interpret():
    """The Pallas kernel (interpret mode on CPU) matches brute force on the
    same snapped coordinates."""
    W, H = 256, 64
    vb, ib = _random_scene(T=60)
    tris = rz.setup_triangles(vb, ib, W, H)
    tris_snapped = tris._replace(xy=rp.snap_xy(tris.xy))

    d_ref, t_ref = rz.rasterize_bruteforce(tris_snapped, W, H)
    d_pl, t_pl = rp.rasterize_pallas(tris, W, H, pair_capacity=4096,
                                     interpret=True)
    d_ref, t_ref = np.asarray(d_ref), np.asarray(t_ref)
    d_pl, t_pl = np.asarray(d_pl), np.asarray(t_pl)

    np.testing.assert_allclose(d_pl, d_ref, atol=2e-4)
    mismatch = (t_pl != t_ref)
    # ids may differ only where depths tie within fp noise or exactly on
    # edges (the top-left bias vs exact == differ in fp32 for big tris)
    assert mismatch.mean() < 0.02, f"{mismatch.sum()} mismatches"


def test_pallas_empty_and_full_tiles():
    """Tiles with zero triangles must come out cleared."""
    W, H = 256, 32
    verts = jnp.asarray(np.array(
        [[-1, 1, 0.5, 1], [0, 1, 0.5, 1], [-1, -1, 0.5, 1]], np.float32))
    idx = jnp.asarray(np.array([0, 1, 2], np.int32))
    tris = rz.setup_triangles(verts, idx, W, H)
    d, t = rp.rasterize_pallas(tris, W, H, pair_capacity=256, interpret=True)
    d, t = np.asarray(d), np.asarray(t)
    # right half of screen: no geometry
    assert (t[:, 192:] == -1).all()
    assert (d[:, 192:] == 1.0).all()
    # left quarter: covered
    assert (t[:, :32] == 0).mean() > 0.5


def test_windowed_pcf_row_major_extraction():
    """The row-major superwindow + exact 8-row y-extraction must agree
    with the direct (unwindowed) Poisson PCF on u16-quantized maps."""
    from crychic_renderer_tpu.ops import shadows as sh

    rng = np.random.default_rng(7)
    S = 64
    maps = rng.random((4, S, S), np.float32)
    maps[:, :24, :] = 1.0
    maps[:, 40:, :] = 0.0
    # quantize like superwindow_maps_u16 so both paths compare equal bits
    mq = np.round(np.clip(maps, 0, 1) * 65535.0) / 65535.0
    swin = sh.superwindow_maps_u16(jnp.asarray(maps))

    H, W = 24, 32
    u = rng.uniform(0.15, 0.85, (H, W)).astype(np.float32)
    v = rng.uniform(0.15, 0.85, (H, W)).astype(np.float32)
    d = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    # keep receiver depths off the u16 half-ULP comparison boundary so
    # the integer-compare (windowed) and float-compare (direct) agree
    d = ((np.floor(d * 65535.0) + 0.75) / 65535.0).astype(np.float32)
    pos = jnp.asarray(np.stack([u, v, d, np.ones_like(u)], -1))
    casc = jnp.asarray(rng.integers(0, 4, (H, W)).astype(np.int32))

    f_win = np.asarray(sh.poisson_pcf_windowed(swin, casc, pos, S))
    f_ref = np.asarray(sh.poisson_pcf(jnp.asarray(mq), casc, pos, S))
    np.testing.assert_allclose(f_win, f_ref, atol=2e-5)
