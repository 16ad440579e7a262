"""Test harness: run everything on an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md section 4 implication).

Note: this image's sitecustomize force-registers the `axon` TPU-tunnel backend
and overrides jax_platforms at interpreter start, so setting JAX_PLATFORMS in
the environment is NOT enough — we must update jax.config after import, before
any backend initializes. Tests on the tunnel would be both slow (RPC per
transfer) and numerically different (TPU bf16 matmuls).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
