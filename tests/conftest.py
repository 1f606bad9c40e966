"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first jax import anywhere in the test
process (the driver's multi-chip dry-run uses the same mechanism).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter startup, so the env var
# is already baked into jax.config — override it programmatically (backends
# have not initialized yet at conftest-import time).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
