"""Test configuration: force CPU platform with a virtual 8-device mesh.

Multi-chip sharding logic is validated on a simulated mesh
(``xla_force_host_platform_device_count``) so the suite runs anywhere; the
same code jit-compiles unchanged on real TPU slices.
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
