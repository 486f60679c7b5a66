import numpy as np

from crychic_renderer_tpu.models import geometry as gg


def test_box_counts_and_first_vertex():
    box = gg.create_box(1.0, 1.0, 1.0, 0)
    assert box.num_vertices == 24
    assert box.indices.shape[0] == 36
    assert np.allclose(box.positions[0], [-0.5, -0.5, -0.5])
    assert np.allclose(box.normals[0], [0, 0, -1])
    assert np.allclose(box.tangents[0], [1, 0, 0])
    assert np.allclose(box.uvs[0], [0, 1])


def test_box_subdivision_counts():
    # Subdivide duplicates 6 verts per tri and splits each tri into 4.
    box = gg.create_box(1, 1, 1, 3)
    assert box.num_triangles == 12 * 4 ** 3
    assert box.num_vertices == 12 * 4 ** 2 * 6  # tris before last subdiv * 6


def test_sphere_counts():
    s = gg.create_sphere(0.5, 20, 20)
    # 2 poles + (stack-1) rings of (slice+1)
    assert s.num_vertices == 2 + 19 * 21
    assert s.indices.shape[0] == 3 * (2 * 20 + (20 - 2) * 20 * 2)
    # all on the sphere
    r = np.linalg.norm(s.positions, axis=1)
    assert np.allclose(r, 0.5, atol=1e-5)


def test_grid_layout():
    g = gg.create_grid(20.0, 30.0, 60, 40)
    assert g.num_vertices == 60 * 40
    assert g.num_triangles == 59 * 39 * 2
    assert np.allclose(g.positions[0], [-10.0, 0.0, 15.0])
    assert np.allclose(g.positions[-1], [10.0, 0.0, -15.0], atol=1e-5)
    assert np.allclose(g.uvs[0], [0, 0])
    assert np.allclose(g.uvs[-1], [1, 1], atol=1e-6)


def test_cylinder_counts():
    c = gg.create_cylinder(0.5, 0.3, 3.0, 20, 20)
    side = 21 * 21
    caps = 2 * (21 + 1)
    assert c.num_vertices == side + caps
    assert c.num_triangles == 20 * 20 * 2 + 2 * 20


def test_quad_is_ndc():
    q = gg.create_quad(0.0, 0.0, 1.0, 1.0, 0.0)
    assert q.num_vertices == 4
    assert np.allclose(q.positions[1], [0, 0, 0])
    assert np.allclose(q.positions[2], [1, 0, 0])


def test_geosphere():
    s = gg.create_geosphere(2.0, 2)
    r = np.linalg.norm(s.positions, axis=1)
    assert np.allclose(r, 2.0, atol=1e-5)
    # normals point radially out
    n = s.positions / r[:, None]
    assert np.allclose(n, s.normals, atol=1e-5)


def test_concat_meshes_offsets():
    box = gg.create_box(1, 1, 1, 0)
    grid = gg.create_grid(10, 10, 4, 4)
    big, subs = gg.concat_meshes([box, grid])
    assert subs[1]["base_vertex"] == 24
    assert subs[1]["start_index"] == 36
    # grid indices were rebased
    rebased = big.indices[subs[1]["start_index"]:]
    assert rebased.min() == 24
