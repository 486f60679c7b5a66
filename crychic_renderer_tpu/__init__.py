"""CRYCHIC-TPU: a TPU-native real-time renderer built on JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of the D3D12 renderer
``UnlimitedRainWorks/CRYCHIC-RENDERER`` (deferred shading, cascaded shadow
maps, SSAO, Cook-Torrance PBR, GPU instancing + frustum culling, sky cubemap)
as a purely functional frame pipeline:

    frame(scene, camera, time) -> image

with the rasterization pipeline (vertex transform, tile binning, depth
test) implemented as a tile-based visibility-buffer rasterizer and each
screen-space pass a fused kernel over pixel tiles.

Layers (bottom-up), mirroring the reference's layer map (SURVEY.md §1):

- ``utils``    — DirectX-convention math kit (row-vector, left-handed,
                 NDC z in [0,1]); MSVC rand replication for seed parity.
- ``io``       — asset pipeline: DDS parser + BC1/BC3 decode, Models/*.txt
                 mesh loader (reference: Common/DDSTextureLoader.cpp,
                 CRYCHIC.cpp:1447 BuildSkullGeometry).
- ``models``   — procedural geometry, cameras, materials, lights, scenes
                 (reference: Common/GeometryGenerator.cpp, Common/Camera.cpp,
                 CRYCHIC.cpp BuildMaterials/Build*RenderItems).
- ``ops``      — device kernels: rasterizer, texture sampling, SSAO,
                 bilateral blur, PBR shading, PCF (reference: Shaders/*.hlsl
                 + the D3D12 rasterizer hardware itself).
- ``passes``   — render passes composed into ``render_frame`` in the exact
                 order of CRYCHIC::Draw (CRYCHIC.cpp:172-436).
- ``parallel`` — multi-chip sharding of the frame over a jax.sharding.Mesh
                 (screen-tile data parallelism + cascade parallelism).
- ``app``      — frame loop, config, stats (reference: Common/d3dApp.cpp).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry correctness: the TPU MXU's DEFAULT matmul precision is one-pass
# bf16 (8 mantissa bits). Measured on v5e: the vertex world/clip einsums
# ran with ~4e4x the f32 rounding error (absolute vertex error up to ~2 px)
# and the raster kernel's triangle-id extraction rounded ids to multiples
# of 128/256 (experiments/einsum_precision_probe.py, the on-TPU parity
# sweep). A renderer's transforms are precision-critical end to end, so the
# package pins full-f32 matmul semantics globally; the FLOP-heavy matmuls
# (the raster kernels' plane evaluations) already request HIGHEST
# explicitly, and the remaining einsums are tiny.
_jax.config.update("jax_default_matmul_precision", "float32")
