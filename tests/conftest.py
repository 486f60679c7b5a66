"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's WARP software-rasterizer fallback
(/root/reference/Common/d3dApp.cpp:435-444): the framework must run without
real accelerator hardware. Multi-chip sharding tests use the 8 virtual
devices.

NOTE: the container's sitecustomize force-selects the TPU-tunnel platform
via jax.config at interpreter start, so overriding the JAX_PLATFORMS env
var is NOT enough — the config itself must be updated before any backend
initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end comparison tests")
