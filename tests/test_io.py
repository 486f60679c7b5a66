import numpy as np
import pytest

from crychic_renderer_tpu.io import dds, mesh_txt

REF_TEX = "/root/reference/Textures"
REF_MODELS = "/root/reference/Models"


def test_load_skull():
    m = mesh_txt.load_mesh_txt(f"{REF_MODELS}/skull.txt")
    assert m.num_vertices == 31076
    assert m.num_triangles == 60339
    assert m.indices.max() < m.num_vertices
    # normals roughly unit
    n = np.linalg.norm(m.normals, axis=1)
    assert (np.abs(n - 1.0) < 0.1).mean() > 0.95
    # tangents unit and orthogonal-ish to normals
    t = np.linalg.norm(m.tangents, axis=1)
    assert np.allclose(t, 1.0, atol=1e-3)


def test_load_car():
    m = mesh_txt.load_mesh_txt(f"{REF_MODELS}/car.txt")
    assert m.num_vertices == 1860
    assert m.num_triangles == 1850


def test_load_dxt1():
    t = dds.load_dds(f"{REF_TEX}/tile.dds")
    assert not t.is_cubemap
    assert t.mips[0].shape[2] == 4
    assert t.mips[0].dtype == np.uint8
    # mip chain halves
    if len(t.mips) > 1:
        assert t.mips[1].shape[0] == max(t.mips[0].shape[0] // 2, 1)


def test_load_dxt5():
    t = dds.load_dds(f"{REF_TEX}/bricks2.dds")
    assert t.mips[0].shape == (512, 512, 4)
    assert len(t.mips) == 10
    # bricks are brownish-red: red channel should dominate blue on average
    m = t.mips[0].astype(np.float32)
    assert m[..., 0].mean() > m[..., 2].mean()


def test_load_rgba8_nmap():
    t = dds.load_dds(f"{REF_TEX}/default_nmap.dds")
    img = t.mips[0]
    # a flat normal map is (128, 128, 255, *): z-dominant
    assert img[..., 2].mean() > 200
    assert abs(float(img[..., 0].mean()) - 128) < 8


def test_white1x1():
    t = dds.load_dds(f"{REF_TEX}/white1x1.dds")
    assert t.mips[0].shape[:2] == (1, 1)
    assert (t.mips[0][0, 0, :3] == 255).all()


def test_generate_mips():
    base = np.full((8, 4, 4), 100, dtype=np.uint8)
    mips = dds.generate_mips(base)
    assert [m.shape[:2] for m in mips] == [(8, 4), (4, 2), (2, 1), (1, 1)]
    assert (mips[-1] == 100).all()


def test_load_bmp_anim_frame():
    import os

    frames = sorted(os.listdir(f"{REF_TEX}/BoltAnim"))
    img = dds.load_bmp(f"{REF_TEX}/BoltAnim/{frames[0]}")
    assert img.ndim == 3 and img.shape[2] == 4


def test_quad_pool_bilinear_matches_reference():
    """The quad-row pool sampler equals a naive 4-fetch wrap bilinear on
    the pool's uniform-size mip-0 image."""
    import jax.numpy as jnp
    from crychic_renderer_tpu.ops import sampling

    S = sampling.POOL_SIZE
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (S, S, 4), dtype=np.uint8)
    pool = sampling.TexturePool.build([[img]])
    n = 64
    uv = jnp.asarray(rng.uniform(-0.3, 1.3, (n, 2)).astype(np.float32))
    tex = jnp.zeros(n, jnp.int32)
    mip = jnp.zeros(n, jnp.int32)
    got = np.asarray(sampling.sample_bilinear(pool, tex, uv, mip))

    # naive reference
    f = img.astype(np.float32) / 255.0
    x = np.asarray(uv)[:, 0] * S - 0.5
    y = np.asarray(uv)[:, 1] * S - 0.5
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = f[y0 % S, x0 % S]
    c10 = f[y0 % S, (x0 + 1) % S]
    c01 = f[(y0 + 1) % S, x0 % S]
    c11 = f[(y0 + 1) % S, (x0 + 1) % S]
    ref = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (
        c01 * (1 - fx) + c11 * fx) * fy
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pool_mip_offsets_analytic():
    from crychic_renderer_tpu.ops import sampling

    # the analytic mip offset matches the straightforward sum
    acc = 0
    for m in range(sampling.POOL_MIPS + 1):
        assert sampling._mip_offset(m) == acc
        if m < sampling.POOL_MIPS:
            acc += (sampling.POOL_SIZE >> m) ** 2
