"""Test harness config: force an 8-device virtual CPU mesh.

Tests validate numerics (f64 available on CPU) and multi-device sharding
without TPU hardware, mirroring the reference's absent test suite with the
strategy from SURVEY.md section 4.  Must set env vars before jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The hosted-TPU sitecustomize force-registers the remote backend with
# jax_platforms="axon,cpu"; env vars alone cannot override it, so pin the
# config explicitly before any backend is touched.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
