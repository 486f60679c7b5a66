"""Loader for the ``Models/*.txt`` mesh format (skull.txt, car.txt).

Format (reference parser: CRYCHIC::BuildSkullGeometry,
/root/reference/CRYCHIC.cpp:1447-1516)::

    VertexCount: N
    TriangleCount: M
    VertexList (pos, normal)
    {
    px py pz nx ny nz     # N lines
    }
    TriangleList
    {
    i0 i1 i2              # M lines
    }

Tangents are synthesized as cross(up, N) with a z-up fallback when the
normal is (anti)parallel to +y (CRYCHIC.cpp:1486-1497); UVs are zero.
"""
from __future__ import annotations

import numpy as np

from ..models.geometry import MeshData


def load_mesh_txt(path: str) -> MeshData:
    from .. import native

    fast = native.parse_mesh_txt(path)
    if fast is not None:
        v, idx = fast
        positions = v[:, :3].copy()
        normals = v[:, 3:].copy()
        tangents = synthesize_tangents(normals)
        uvs = np.zeros((v.shape[0], 2), dtype=np.float32)
        return MeshData(positions, normals, tangents, uvs, idx)

    with open(path, "r") as f:
        tokens = f.read().split()
    it = iter(tokens)

    def expect_kv(key):
        k = next(it)
        assert k.lower().startswith(key.lower()[:6]), (k, key)
        return int(next(it))

    vcount = expect_kv("VertexCount:")
    tcount = expect_kv("TriangleCount:")
    # skip "VertexList (pos, normal) {"
    tok = next(it)
    while not tok.endswith("{"):
        tok = next(it)

    vals = np.empty(vcount * 6, dtype=np.float32)
    for i in range(vcount * 6):
        vals[i] = float(next(it))
    v = vals.reshape(vcount, 6)
    positions = v[:, :3].copy()
    normals = v[:, 3:].copy()

    # skip "} TriangleList {"
    tok = next(it)
    while not tok.endswith("{"):
        tok = next(it)
    idx = np.empty(tcount * 3, dtype=np.int32)
    for i in range(tcount * 3):
        idx[i] = int(next(it))

    tangents = synthesize_tangents(normals)
    uvs = np.zeros((vcount, 2), dtype=np.float32)
    return MeshData(positions, normals, tangents, uvs, idx)


def synthesize_tangents(normals: np.ndarray) -> np.ndarray:
    """cross(up, N), falling back to cross(N, z) near the poles
    (CRYCHIC.cpp:1486-1497)."""
    up = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    z = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    t_main = np.cross(np.broadcast_to(up, normals.shape), normals)
    t_fallback = np.cross(normals, np.broadcast_to(z, normals.shape))
    use_fallback = np.abs(normals @ up) >= 1.0 - 0.001
    t = np.where(use_fallback[:, None], t_fallback, t_main)
    n = np.linalg.norm(t, axis=-1, keepdims=True)
    return (t / np.maximum(n, 1e-20)).astype(np.float32)
