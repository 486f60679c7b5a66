"""Native C++ asset pipeline vs pure-numpy parity."""
import numpy as np
import pytest

from crychic_renderer_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C++ toolchain")


def test_bc1_parity():
    from crychic_renderer_tpu.io import dds

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 8 * 16, dtype=np.uint8).tobytes()
    w, h = 16, 4
    ref = dds._decode_bc1_numpy(data, w, h)
    fast = native.decode_bc1(data, w, h)
    np.testing.assert_array_equal(fast, ref)


def test_bc3_parity():
    from crychic_renderer_tpu.io import dds

    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 16 * 16, dtype=np.uint8).tobytes()
    w, h = 16, 4
    ref = dds._decode_bc3_numpy(data, w, h)
    fast = native.decode_bc3(data, w, h)
    np.testing.assert_array_equal(fast, ref)


def test_mesh_parse_parity():
    fast = native.parse_mesh_txt("/root/reference/Models/car.txt")
    assert fast is not None
    v, idx = fast
    assert v.shape == (1860, 6)
    assert idx.shape == (1850 * 3,)
    assert idx.max() < 1860


def test_msvc_texture_parity():
    from crychic_renderer_tpu.utils.msvcrand import MsvcRand

    fast = native.msvc_random_texture(4, 1, 14)
    rnd = MsvcRand(1)
    for _ in range(14):
        rnd.randf()
    ref = np.zeros((4, 4, 3), np.float32)
    for i in range(4):
        for j in range(4):
            for c in range(3):
                ref[i, j, c] = np.round(rnd.randf() * 255.0) / 255.0
    np.testing.assert_allclose(fast, ref, atol=1e-7)
