"""Mesh sharding: DP+TP train step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from analysisgnn_tpu.distributed.mesh import make_mesh


def test_mesh_axes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    assert mesh.shape["model"] == 2


def test_dryrun_multichip_runs():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())
