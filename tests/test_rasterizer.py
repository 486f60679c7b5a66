import numpy as np
import jax.numpy as jnp

from crychic_renderer_tpu.ops import rasterizer as rz
from crychic_renderer_tpu.utils import mathutil as mu
from crychic_renderer_tpu.models import geometry as gg
from crychic_renderer_tpu.models.camera import Camera


def ndc_quad_clip(z=0.5):
    """Full-screen quad in clip space (w=1), CW front in screen space."""
    # NDC corners; screen y flips, so CW-screen = this NDC order
    verts = np.array(
        [
            [-1, 1, z, 1],   # top-left (screen)
            [1, 1, z, 1],    # top-right
            [1, -1, z, 1],   # bottom-right
            [-1, -1, z, 1],  # bottom-left
        ],
        dtype=np.float32,
    )
    idx = np.array([0, 1, 2, 0, 2, 3], dtype=np.int32)
    return jnp.asarray(verts), jnp.asarray(idx)


def test_fullscreen_quad_covers_everything_once():
    W, H = 64, 48
    verts, idx = ndc_quad_clip(0.25)
    depth, tid = rz.rasterize(verts, idx, W, H, backend="brute")
    assert np.allclose(np.asarray(depth), 0.25)
    # shared diagonal: every pixel belongs to exactly one triangle
    assert set(np.unique(np.asarray(tid))) == {0, 1}


def test_backface_culled():
    W, H = 32, 32
    verts, idx = ndc_quad_clip(0.25)
    idx_rev = idx[::-1]  # reverse winding -> back-facing
    depth, tid = rz.rasterize(verts, idx_rev, W, H, backend="brute")
    assert np.all(np.asarray(tid) == -1)
    assert np.allclose(np.asarray(depth), 1.0)


def test_depth_test_nearer_wins():
    W, H = 32, 32
    v1, i1 = ndc_quad_clip(0.8)
    v2, i2 = ndc_quad_clip(0.3)
    verts = jnp.concatenate([v1, v2])
    idx = jnp.concatenate([i1, i2 + 4])
    depth, tid = rz.rasterize(verts, idx, W, H, backend="brute")
    assert np.allclose(np.asarray(depth), 0.3)
    assert np.all(np.asarray(tid) >= 2)  # the nearer quad's triangles win


def _compare_binned_brute(vb, ib, W, H):
    """Binned and brute rasterizers agree up to fp noise.

    Depth: binned evaluates z as a screen-space plane (zA*x+zB*y+zC) while
    brute uses barycentric form — identical math, different fp rounding, so
    allow ~1e-4. Winner ids may flip only where two triangles' depths are
    within that noise.
    """
    d_brute, t_brute = rz.rasterize(vb, ib, W, H, backend="brute")
    d_bin, t_bin = rz.rasterize(vb, ib, W, H, backend="binned",
                                pair_capacity=4096, bin_cap=128)
    d_brute, t_brute = np.asarray(d_brute), np.asarray(t_brute)
    d_bin, t_bin = np.asarray(d_bin), np.asarray(t_bin)
    np.testing.assert_allclose(d_bin, d_brute, atol=1e-4)
    mismatch = t_bin != t_brute
    assert mismatch.mean() < 0.01, f"{mismatch.sum()} id mismatches"
    if mismatch.any():
        assert np.abs(d_bin - d_brute)[mismatch].max() < 1e-4
    return t_bin


def test_binned_matches_brute_random_scene():
    rng = np.random.default_rng(0)
    W, H = 96, 80  # not multiples of tile size on purpose
    T = 60
    # random triangles in clip space with w=1, z in (0, 1)
    verts = rng.uniform(-1.3, 1.3, size=(T * 3, 4)).astype(np.float32)
    verts[:, 2] = rng.uniform(0.01, 0.99, size=T * 3)
    verts[:, 3] = 1.0
    idx = np.arange(T * 3, dtype=np.int32)
    _compare_binned_brute(jnp.asarray(verts), jnp.asarray(idx), W, H)


def test_binned_matches_brute_perspective_mesh():
    cam = Camera()
    cam.set_position(0.0, 2.0, -6.0)
    cam.set_lens(0.25 * np.pi, 4 / 3, 1.0, 100.0)
    box = gg.create_box(2.0, 2.0, 2.0, 1)
    world = mu.rotation_y(0.7) @ mu.translation(0.0, 1.5, 0.0)
    clip = mu.transform_point(box.positions, world @ cam.view_proj)
    W, H = 96, 80
    t = _compare_binned_brute(jnp.asarray(clip), jnp.asarray(box.indices), W, H)
    # something visible, something not
    assert (t >= 0).any() and (t == -1).any()


def test_near_plane_cull():
    W, H = 32, 32
    verts = np.array(
        [[-1, 1, 0.5, 1], [1, 1, 0.5, 1], [0, -1, -0.5, -1.0]],
        dtype=np.float32,
    )
    idx = np.array([0, 1, 2], dtype=np.int32)
    depth, tid = rz.rasterize(jnp.asarray(verts), jnp.asarray(idx), W, H,
                              backend="brute")
    assert np.all(np.asarray(tid) == -1)


def test_barycentrics_sum_and_interp():
    xy = jnp.asarray(np.array([[[10.0, 10.0], [50.0, 10.0], [10.0, 50.0]]]))
    b = rz.barycentrics_at(xy, jnp.asarray([20.0]), jnp.asarray([20.0]))
    assert np.allclose(np.asarray(b).sum(), 1.0, atol=1e-6)
    # at vertex 0 the weight of vertex 0 is 1
    b0 = rz.barycentrics_at(xy, jnp.asarray([10.0]), jnp.asarray([10.0]))
    assert np.allclose(np.asarray(b0)[0], [1, 0, 0], atol=1e-6)


def test_bin_overflow_flag():
    verts, idx = ndc_quad_clip(0.5)
    tris = rz.setup_triangles(verts, idx, 1024, 1024)
    bins = rz.bin_triangles(tris, 1024, 1024, pair_capacity=4)
    assert bool(bins.overflowed)


def test_near_plane_clipping():
    """Triangles crossing the near plane are clipped, not dropped."""
    from crychic_renderer_tpu.ops import clipping

    # a big triangle straddling z=0 in clip space (w = z + 1 style)
    tri = np.zeros((1, 3, 16), np.float32)
    tri[0, 0, :4] = [0.0, 0.5, 0.5, 1.0]    # in front
    tri[0, 1, :4] = [0.5, -0.5, 0.5, 1.0]   # in front
    tri[0, 2, :4] = [-0.5, -0.5, -0.5, 0.2]  # behind near plane
    tri[0, :, 4] = [1.0, 2.0, 3.0]  # an attribute to interpolate
    out, valid = clipping.clip_near(jnp.asarray(tri), jnp.asarray([True]))
    out, valid = np.asarray(out), np.asarray(valid)
    assert valid.tolist() == [True, True]  # quad case -> 2 triangles
    # all output vertices have z >= 0
    assert (out[valid][..., 2] >= -1e-6).all()
    # clipped-vertex attribute is a lerp between the crossing endpoints
    zs = out[valid][..., 2].ravel()
    attrs = out[valid][..., 4].ravel()
    assert attrs.min() >= 1.0 - 1e-5 and attrs.max() <= 3.0 + 1e-5


def test_clip_all_inside_and_outside():
    from crychic_renderer_tpu.ops import clipping

    tri_in = np.zeros((1, 3, 16), np.float32)
    tri_in[0, :, 2] = 0.5  # all z >= 0
    tri_in[0, :, 3] = 1.0
    out, valid = clipping.clip_near(jnp.asarray(tri_in), jnp.asarray([True]))
    assert np.asarray(valid).tolist() == [True, False]
    np.testing.assert_array_equal(np.asarray(out)[0], tri_in[0])

    tri_out = np.zeros((1, 3, 16), np.float32)
    tri_out[0, :, 2] = -0.5
    out, valid = clipping.clip_near(jnp.asarray(tri_out), jnp.asarray([True]))
    assert np.asarray(valid).tolist() == [False, False]
