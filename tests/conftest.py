"""Test configuration: force CPU platform with a virtual 8-device mesh.

Multi-chip sharding logic is validated on a simulated mesh
(``xla_force_host_platform_device_count``) so the suite runs anywhere; the
same code jit-compiles unchanged on real TPU slices.
"""

import os

# XLA_FLAGS must be in place before the first backend initialization (jax may
# already be imported by the environment's sitecustomize, but backends are
# lazy, so flag + platform overrides here still take effect).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
