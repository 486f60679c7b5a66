import numpy as np

from crychic_renderer_tpu.utils import mathutil as mu


def test_perspective_fov_lh_entries():
    # fovY = pi/2 -> h = cot(pi/4) = 1; aspect 2 -> w = 0.5
    m = mu.perspective_fov_lh(np.pi / 2, 2.0, 1.0, 100.0)
    assert np.isclose(m[0, 0], 0.5)
    assert np.isclose(m[1, 1], 1.0)
    assert np.isclose(m[2, 2], 100.0 / 99.0)
    assert np.isclose(m[2, 3], 1.0)
    assert np.isclose(m[3, 2], -100.0 / 99.0)
    # point on the near plane maps to z_ndc = 0, far plane to 1
    p_near = mu.transform_point(np.array([0.0, 0.0, 1.0], np.float32), m)
    p_far = mu.transform_point(np.array([0.0, 0.0, 100.0], np.float32), m)
    assert np.isclose(p_near[2] / p_near[3], 0.0, atol=1e-6)
    assert np.isclose(p_far[2] / p_far[3], 1.0, atol=1e-6)


def test_ortho_off_center_lh_maps_box_to_ndc():
    m = mu.ortho_off_center_lh(-10, 30, -5, 15, 2.0, 50.0)
    lo = mu.transform_point(np.array([-10.0, -5.0, 2.0], np.float32), m)
    hi = mu.transform_point(np.array([30.0, 15.0, 50.0], np.float32), m)
    assert np.allclose(lo[:3] / lo[3], [-1, -1, 0], atol=1e-6)
    assert np.allclose(hi[:3] / hi[3], [1, 1, 1], atol=1e-6)


def test_look_at_lh():
    eye = np.array([0.0, 0.0, -10.0])
    m = mu.look_at_lh(eye, [0, 0, 0], [0, 1, 0])
    # eye maps to origin
    assert np.allclose(mu.transform_point(eye.astype(np.float32), m)[:3], 0, atol=1e-6)
    # a point in front of the eye has positive view z (left-handed)
    p = mu.transform_point(np.array([0.0, 0.0, -5.0], np.float32), m)
    assert p[2] > 0


def test_row_vector_translation():
    m = mu.translation(1.0, 2.0, 3.0)
    p = mu.transform_point(np.zeros(3, np.float32), m)
    assert np.allclose(p[:3], [1, 2, 3])


def test_rotation_y_matches_directxmath():
    # XMMatrixRotationY rotates +z toward +x for positive angle (LH):
    m = mu.rotation_y(np.pi / 2)
    p = mu.transform_normal(np.array([0.0, 0.0, 1.0], np.float32), m)
    assert np.allclose(p, [1, 0, 0], atol=1e-6)


def test_rotation_axis_matches_rotation_y():
    for ang in (0.3, -1.2):
        a = mu.rotation_axis(np.array([0.0, 1.0, 0.0]), ang)
        b = mu.rotation_y(ang)
        assert np.allclose(a, b, atol=1e-6)


def test_ndc_to_tex():
    T = mu.ndc_to_tex()
    # NDC (-1, 1) (top-left) -> uv (0, 0)
    p = mu.transform_point(np.array([-1.0, 1.0, 0.5], np.float32), T)
    assert np.allclose(p[:2], [0, 0], atol=1e-6)
    p = mu.transform_point(np.array([1.0, -1.0, 0.5], np.float32), T)
    assert np.allclose(p[:2], [1, 1], atol=1e-6)
