"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated against XLA's CPU backend with 8 virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py).

Opt-in TPU lane: `PT_TPU_TESTS=1 pytest tests/test_tpu_lane.py` keeps the
real TPU backend (no CPU override) and runs the non-interpret pallas
kernels + a sharded scorer on the actual chip, so compiled-kernel
regressions surface in tests rather than only in bench runs. All other
test modules remain CPU-forced even under the flag (they assume the
virtual 8-device mesh).

Note: jax may already be imported by the interpreter's sitecustomize with
JAX_PLATFORMS pointing at the TPU plugin, so the platform override must go
through jax.config (env vars are captured at import time); XLA_FLAGS is read
lazily at first backend init, which hasn't happened yet here.
"""

import os

TPU_LANE = os.environ.get("PT_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_LANE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    skip_cpu = pytest.mark.skip(
        reason="PT_TPU_TESTS=1: only tests/test_tpu_lane.py runs on the "
               "TPU backend (other modules assume the virtual CPU mesh)")
    skip_tpu = pytest.mark.skip(reason="needs PT_TPU_TESTS=1 + a real TPU")
    for item in items:
        is_lane = "test_tpu_lane" in item.nodeid
        if TPU_LANE and not is_lane:
            item.add_marker(skip_cpu)
        elif not TPU_LANE and is_lane:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
