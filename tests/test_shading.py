import numpy as np
import jax.numpy as jnp

from crychic_renderer_tpu.ops import shading, ssao as ssao_ops, shadows
from crychic_renderer_tpu.models.materials import Lights


def test_schlick_fresnel_limits():
    r0 = jnp.asarray([[0.04, 0.04, 0.04]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # grazing: full reflection
    grazing = shading.schlick_fresnel(r0, n, jnp.asarray([[1.0, 0.0, 0.0]]))
    assert np.allclose(np.asarray(grazing), 1.0, atol=1e-6)
    # head-on: r0
    head_on = shading.schlick_fresnel(r0, n, jnp.asarray([[0.0, 0.0, 1.0]]))
    assert np.allclose(np.asarray(head_on), 0.04, atol=1e-6)


def test_normal_map_flat_sample_preserves_normal():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    t = jnp.asarray([[1.0, 0.0, 0.0]])
    flat = jnp.asarray([[0.5, 0.5, 1.0]])  # tangent-space +z
    out = shading.normal_sample_to_world(flat, n, t)
    assert np.allclose(np.asarray(out), [[0, 1, 0]], atol=1e-6)


def test_pbr_energy_reasonable():
    lights = Lights.empty()
    lights.direction[0] = (0.0, -1.0, 0.0)
    lights.strength[0] = (1.0, 1.0, 1.0)
    lights.num_dir = 1
    n = jnp.asarray([[[0.0, 1.0, 0.0]]])
    v = jnp.asarray([[[0.0, 1.0, 0.0]]])
    pos = jnp.zeros((1, 1, 3))
    albedo = jnp.full((1, 1, 4), 0.8)
    direct = shading.pbr_shading(lights, n, v, pos, albedo,
                                 jnp.full((1, 1, 1), 0.5),
                                 jnp.full((1, 1, 1), 0.5),
                                 jnp.ones((1, 1, 1)))
    d = np.asarray(direct)
    assert (d > 0).all() and (d < 2.0).all()


def test_pbr_shadow_pow5():
    lights = Lights.empty()
    lights.direction[0] = (0.0, -1.0, 0.0)
    lights.strength[0] = (1.0, 1.0, 1.0)
    lights.num_dir = 1
    n = jnp.asarray([[[0.0, 1.0, 0.0]]])
    v = jnp.asarray([[[0.0, 1.0, 0.0]]])
    pos = jnp.zeros((1, 1, 3))
    albedo = jnp.full((1, 1, 4), 0.8)
    args = (lights, n, v, pos, albedo, jnp.full((1, 1, 1), 0.5),
            jnp.full((1, 1, 1), 0.5))
    full = np.asarray(shading.pbr_shading(*args, jnp.ones((1, 1, 1))))
    half = np.asarray(shading.pbr_shading(*args, jnp.full((1, 1, 1), 0.5)))
    assert np.allclose(half / full, 0.5 ** 5, atol=1e-5)


def test_tonemap_range():
    x = jnp.asarray([0.0, 1.0, 10.0, 1e6])
    y = np.asarray(shading.tonemap_direct(x))
    assert (y >= 0).all() and (y <= 1).all()
    assert y[0] == 0.0 and y[3] > 0.99


def test_gauss_weights_match_reference_shape():
    w = ssao_ops.calc_gauss_weights(2.5)
    assert len(w) == 11
    assert np.isclose(w.sum(), 1.0, atol=1e-6)
    assert w[5] == w.max()


def test_offset_vectors_deterministic():
    a = ssao_ops.build_offset_vectors()
    b = ssao_ops.build_offset_vectors()
    assert np.array_equal(a, b)
    lens = np.linalg.norm(a, axis=1)
    assert (lens >= 0.25 - 1e-6).all() and (lens <= 1.0 + 1e-6).all()


def test_bilateral_blur_preserves_flat_region():
    amb = jnp.full((16, 64), 0.5)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (16, 64, 3))
    depth = jnp.full((16, 64), 5.0)
    w = jnp.asarray(ssao_ops.calc_gauss_weights(2.5))
    out = ssao_ops.bilateral_blur(amb, nrm, depth, w, True)
    assert np.allclose(np.asarray(out), 0.5, atol=1e-6)


def test_bilateral_blur_stops_at_depth_edge():
    amb = jnp.concatenate([jnp.zeros((16, 32)), jnp.ones((16, 32))], axis=1)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (16, 64, 3))
    depth = jnp.concatenate([jnp.full((16, 32), 5.0),
                             jnp.full((16, 32), 50.0)], axis=1)
    w = jnp.asarray(ssao_ops.calc_gauss_weights(2.5))
    out = np.asarray(ssao_ops.bilateral_blur(amb, nrm, depth, w, True))
    # the depth discontinuity prevents bleed: left stays 0, right stays 1
    assert np.allclose(out[:, :32], 0.0, atol=1e-6)
    assert np.allclose(out[:, 32:], 1.0, atol=1e-6)


def test_pcf_fully_lit_and_fully_shadowed():
    S = 64
    maps = jnp.ones((4, S, S))  # far depth everywhere
    # a pixel whose shadow-space depth is 0.5 -> 0.5 <= 1.0 -> lit
    shadow_pos = jnp.asarray([[[0.5 * S and 0.5, 0.5, 0.5, 1.0]]])
    shadow_pos = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5, 1.0]),
                                  (4, 4, 4))
    cascade = jnp.zeros((4, 4), jnp.int32)
    lit = shadows.poisson_pcf(maps, cascade, shadow_pos, S)
    assert np.allclose(np.asarray(lit), 1.0, atol=1e-6)
    maps0 = jnp.zeros((4, S, S))  # occluder at depth 0 everywhere
    shadowed = shadows.poisson_pcf(maps0, cascade, shadow_pos, S)
    assert np.allclose(np.asarray(shadowed), 0.0, atol=1e-6)


def test_cascade_selection_distance():
    S = 32
    maps = jnp.ones((4, S, S))
    # identity-ish shadow transforms mapping world xz to uv center
    M = np.zeros((4, 4, 4), np.float32)
    for c in range(4):
        M[c] = np.eye(4)
        M[c][3, :3] = 0.5  # translate into the map
        M[c][0, 0] = M[c][1, 1] = M[c][2, 2] = 0.001
    M = jnp.asarray(M)
    eye = jnp.asarray([0.0, 0.0, 0.0])
    # beyond the last radius: factor 1 regardless of maps
    far_pos = jnp.asarray([[[200.0, 0.0, 0.0]]])
    f = shadows.cascade_shadow_factor(jnp.zeros((4, S, S)), M, far_pos, eye,
                                      S, deferred_blend_quirk=True)
    assert np.allclose(np.asarray(f), 1.0)


def test_windowed_pcf_matches_per_tap():
    """The windowed PCF formulation equals the per-tap reference."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    S = 64
    maps = jnp.asarray(rng.random((4, S, S), np.float32))
    n = 64
    u = rng.uniform(0.15, 0.85, n).astype(np.float32)
    v = rng.uniform(0.15, 0.85, n).astype(np.float32)
    z = rng.uniform(0.2, 0.8, n).astype(np.float32)
    pos = jnp.asarray(np.stack([u, v, z, np.ones_like(u)], -1))
    casc = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    a = shadows.poisson_pcf(maps, casc, pos, S)
    b = shadows.poisson_pcf_windowed(maps, casc, pos, S)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_superwindow_packed_split_identity():
    """pack_depth_rows_u16 + superwindow_from_packed equals
    superwindow_maps_u16 bit-exactly, and cascade_shadow_factor on the
    pre-packed form equals the raw-f32 form — the contract the sharded
    atlas exchange relies on (pack per device BEFORE the all_gather)."""
    rng = np.random.default_rng(7)
    S = 32
    maps = jnp.asarray(rng.random((4, S, S), dtype=np.float32))
    a = shadows.superwindow_maps_u16(maps)
    b = shadows.superwindow_from_packed(shadows.pack_depth_rows_u16(maps))
    assert a.shape == b.shape and (np.asarray(a) == np.asarray(b)).all()

    M = np.zeros((4, 4, 4), np.float32)
    for c in range(4):
        M[c] = np.eye(4)
        M[c][3, :3] = 0.5
        M[c][0, 0] = M[c][1, 1] = M[c][2, 2] = 0.01
    M = jnp.asarray(M)
    eye = jnp.zeros(3)
    pos = jnp.asarray(rng.uniform(-20, 20, (4, 4, 3)).astype(np.float32))
    f_raw = shadows.cascade_shadow_factor(maps, M, pos, eye, S,
                                          deferred_blend_quirk=True)
    f_packed = shadows.cascade_shadow_factor(
        shadows.pack_depth_rows_u16(maps), M, pos, eye, S,
        deferred_blend_quirk=True)
    assert (np.asarray(f_raw) == np.asarray(f_packed)).all()


def test_cascade_parity_split_matches_single_table():
    """cascade_shadow_factor's cascade-parity table split (two 2-cascade
    superwindow tables) is bit-exact vs the single-table formulation, at
    positions spanning every cascade (incl. c=3, which blends with itself
    and whose blend flag is false) and the no-shadow range, in both quirk
    modes."""
    rng = np.random.default_rng(11)
    S = 32
    maps = jnp.asarray(rng.random((4, S, S), dtype=np.float32))
    M = np.zeros((4, 4, 4), np.float32)
    for c in range(4):
        M[c] = np.eye(4)
        M[c][3, :3] = 0.5
        M[c][0, 0] = M[c][1, 1] = M[c][2, 2] = 0.004
    M = jnp.asarray(M)
    eye = jnp.zeros(3)
    # distances 5..120 sweep cascades 0..3 (radii 30/50/80/100) + none
    d = np.linspace(5.0, 120.0, 64, dtype=np.float32)
    pos = np.zeros((8, 8, 3), np.float32)
    pos[..., 0] = d.reshape(8, 8)
    pos = jnp.asarray(pos)

    from crychic_renderer_tpu.ops.shading import rowmat
    from crychic_renderer_tpu.models.cascades import CASCADE_RADII

    def single_table_reference(quirk):
        radii = jnp.asarray(CASCADE_RADII)
        dist = jnp.sqrt(((eye - pos) ** 2).sum(-1))
        past = (dist[..., None] >= radii[None, None, :]).sum(-1)
        c = jnp.clip(past, 0, 3).astype(jnp.int32)
        ph = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
        all_pos = jnp.stack([rowmat(ph, M[ci]) for ci in range(4)])

        def pos_for(ci):
            sel = (jnp.arange(4)[:, None, None, None]
                   == ci[None, ..., None]).astype(all_pos.dtype)
            return (all_pos * sel).sum(axis=0)

        swin = shadows.superwindow_maps_u16(maps)
        cn = jnp.minimum(c + 1, 3)
        f_c = shadows.poisson_pcf_windowed(swin, c, pos_for(c), S)
        f_n = shadows.poisson_pcf_windowed(swin, cn, pos_for(cn), S)
        blend = (c < 3) if quirk else (
            (c < 3) & (jnp.abs(dist - radii[c]) < 10.0))
        f = jnp.where(blend, 0.5 * (f_c + f_n), f_c)
        return jnp.where(past >= 4, 1.0, f)

    for quirk in (True, False):
        got = shadows.cascade_shadow_factor(
            maps, M, pos, eye, S, deferred_blend_quirk=quirk)
        want = single_table_reference(quirk)
        assert (np.asarray(got) == np.asarray(want)).all()
    # the sweep actually exercises every cascade
    dist = np.asarray(np.sqrt(((np.zeros(3) - np.asarray(pos)) ** 2
                               ).sum(-1)))
    past = (dist[..., None] >= np.asarray(CASCADE_RADII)).sum(-1)
    assert set(np.clip(past, 0, 4).ravel()) == {0, 1, 2, 3, 4}


def test_grid_pcf_boxes():
    S = 32
    maps = jnp.ones((4, S, S))
    pos = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5, 1.0]), (2, 2, 4))
    casc = jnp.zeros((2, 2), jnp.int32)
    for r in (1, 2):  # 3x3 and 5x5
        f = shadows.grid_pcf(maps, casc, pos, S, radius_texels=r)
        assert np.allclose(np.asarray(f), 1.0)


def test_gbuffer_roundtrip():
    from crychic_renderer_tpu.ops import gbuffer

    rng = np.random.default_rng(0)
    H, W = 4, 8
    pos = jnp.asarray(rng.random((H, W, 3), np.float32))
    met = jnp.asarray(rng.random((H, W, 1), np.float32))
    alb = jnp.asarray(rng.random((H, W, 4), np.float32))
    rough = jnp.asarray(rng.random((H, W, 1), np.float32))
    n = jnp.asarray(rng.random((H, W, 3), np.float32) - 0.5)
    gbs = gbuffer.encode(pos, met, alb, rough, n)
    d = gbuffer.decode(*gbs)
    np.testing.assert_allclose(np.asarray(d["pos_w"]), np.asarray(pos))
    np.testing.assert_allclose(np.asarray(d["roughness"]), np.asarray(rough))
    # normals come back normalized
    ln = np.linalg.norm(np.asarray(d["normal_w"]), axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)
