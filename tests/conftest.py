"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated against XLA's CPU backend with 8 virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py).

Note: jax may already be imported by the interpreter's sitecustomize with
JAX_PLATFORMS pointing at the TPU plugin, so the platform override must go
through jax.config (env vars are captured at import time); XLA_FLAGS is read
lazily at first backend init, which hasn't happened yet here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
