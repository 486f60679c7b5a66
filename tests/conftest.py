"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's WARP software-rasterizer fallback
(/root/reference/Common/d3dApp.cpp:435-444): the framework must run without
real accelerator hardware. Multi-chip sharding tests use the 8 virtual
devices.
"""
import os

# Hard override: the ambient environment may point JAX at a TPU
# (JAX_PLATFORMS=axon); tests must be hermetic and run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
