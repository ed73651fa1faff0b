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

# Under pytest-xdist each worker process creates its own 8-device CPU
# backend; N workers x 8 device threadpools x intra-op Eigen pools
# oversubscribe the host badly enough to wedge collective-heavy tests
# (observed hang at -n 4 on a 4-core host).  Pin each worker's intra-op
# pool to one thread so N workers use ~N cores total.
if os.environ.get("PYTEST_XDIST_WORKER"):
    if "multi_thread_eigen" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_cpu_multi_thread_eigen=false"
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["OPENBLAS_NUM_THREADS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
