import numpy as np

from crychic_renderer_tpu.models.camera import BoundingFrustum, Camera, frustum_aabb_intersects
from crychic_renderer_tpu.models.cascades import fit_cascades
from crychic_renderer_tpu.utils import mathutil as mu


def make_scene_camera():
    cam = Camera()
    cam.set_position(0.0, 2.0, -15.0)
    cam.set_lens(0.25 * np.pi, 1920 / 1080, 1.0, 100.0)
    return cam


def test_view_matrix_identity_at_origin():
    cam = Camera()
    assert np.allclose(cam.view, np.eye(4))


def test_view_matrix_translation():
    cam = make_scene_camera()
    v = cam.view
    p = mu.transform_point(np.array([0.0, 2.0, -15.0], np.float32), v)
    assert np.allclose(p[:3], 0, atol=1e-5)
    # a point 10 in front has view z = 10
    p = mu.transform_point(np.array([0.0, 2.0, -5.0], np.float32), v)
    assert np.allclose(p[:3], [0, 0, 10], atol=1e-5)


def test_walk_strafe_rotate():
    cam = Camera()
    cam.rotate_y(np.pi / 2)  # look becomes +x... (LH rotate +z toward +x)
    assert np.allclose(cam.look, [1, 0, 0], atol=1e-6)
    cam.walk(5.0)
    assert np.allclose(cam.position, [5, 0, 0], atol=1e-5)
    cam.strafe(2.0)  # right is now -z? right rotates from +x to -z
    assert np.allclose(cam.position, [5, 0, -2], atol=1e-5)


def test_frustum_culling():
    cam = make_scene_camera()
    fr = BoundingFrustum(cam.proj)
    # view -> world (box in world space at origin is in front of the camera)
    inv_view = np.linalg.inv(cam.view)
    planes = fr.planes_in(inv_view)
    centers = np.array([[0, 2, 0], [0, 2, -50], [0, 200, 0]], dtype=np.float32)
    extents = np.ones((3, 3), dtype=np.float32)
    vis = frustum_aabb_intersects(planes, centers, extents)
    assert vis.tolist() == [True, False, False]


def test_cascade_fit_covers_slice():
    cam = make_scene_camera()
    light_dir = np.array([0.57735, -0.57735, 0.57735], dtype=np.float32)
    ct = fit_cascades(cam, light_dir, shadow_map_size=2048)
    assert ct.shadow_transforms.shape == (4, 4, 4)

    # each cascade's ortho box must contain its frustum slice corners
    splits = [1.0, 30.0, 50.0, 80.0, 100.0]
    for c in range(4):
        proj = mu.perspective_fov_lh(cam.fov_y, cam.aspect, splits[c], splits[c + 1])
        inv_vp = np.linalg.inv(cam.view @ proj)
        corners_ndc = np.array(
            [[x, y, z] for z in (0, 1) for y in (-1, 1) for x in (-1, 1)],
            dtype=np.float32,
        )
        ch = mu.transform_point(corners_ndc, inv_vp)
        corners = ch[:, :3] / ch[:, 3:4]
        vp = ct.light_views[c] @ ct.light_projs[c]
        ndc = mu.transform_point(corners, vp)
        ndc = ndc[:, :3] / ndc[:, 3:4]
        # snapping moves the box by <= 1 texel; allow small slack
        assert ndc[:, 0].min() >= -1.01 and ndc[:, 0].max() <= 1.01
        assert ndc[:, 1].min() >= -1.01 and ndc[:, 1].max() <= 1.01
        assert ndc[:, 2].min() >= -0.01 and ndc[:, 2].max() <= 1.01

    # shadow transform maps slice corners into [0,1]^2 uv
    uvh = mu.transform_point(corners, ct.shadow_transforms[3])
    uv = uvh[:, :2] / uvh[:, 3:4]
    assert uv.min() >= -0.01 and uv.max() <= 1.01


def test_msvc_rand_stream():
    from crychic_renderer_tpu.utils.msvcrand import MsvcRand

    r = MsvcRand(seed=1)
    # Known first values of the MSVC LCG with seed 1: 41, 18467, 6334, 26500, 19169
    assert [r.rand() for _ in range(5)] == [41, 18467, 6334, 26500, 19169]
