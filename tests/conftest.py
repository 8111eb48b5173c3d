"""Test config: force a virtual 8-device CPU platform so sharding tests
run anywhere (the driver validates real-TPU paths separately)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# A TPU-tunnel sitecustomize (if present) may have already imported jax
# and forced jax_platforms='axon,cpu' — override it back before any
# backend initializes, or the suite flip-flops between 1 axon device and
# 8 CPU devices depending on tunnel availability.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
