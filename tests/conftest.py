"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests run on CPU for determinism and speed; the driver separately validates
the TPU path (bench.py) and the multi-chip sharding (__graft_entry__.py).
"""

import os

# Force CPU: the ambient environment (sitecustomize) registers the "axon"
# TPU-tunnel backend and forces jax_platforms="axon,cpu"; unit tests must
# not run over the tunnel. Setting the env var is not enough — override the
# config after import, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
