"""Combine-path equivalence: off-TPU the engine routes the global
accumulation through the pure-XLA element gather (the Pallas lane-select
row path only runs in interpret mode there, ~14x slower); this test pins
the interpret-mode row+kernel path against it so the TPU kernels keep CPU
coverage (EQLB_FORCE_LANE_SELECT restores them off-TPU)."""

import os

import numpy as np
import pytest

from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
from dolfinx_eqlb_tpu.eqlb.patches import build_patches
from dolfinx_eqlb_tpu.fem import FunctionSpace
from dolfinx_eqlb_tpu.mesh import unit_square


@pytest.mark.parametrize("n_rhs", [1, 2, 3, 5])
def test_lane_select_matches_elem_gather(n_rhs, monkeypatch):
    msh = unit_square(5)
    V = FunctionSpace(msh, "RT", 2)
    rng = np.random.default_rng(3)
    nc, ndg = msh.num_cells, 3
    dp = rng.normal(size=(n_rhs, nc, 2, ndg))
    dr = rng.normal(size=(n_rhs, nc, ndg))
    fk = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None].repeat(
        n_rhs, 0)
    bv = np.zeros((n_rhs, msh.num_facets, 2))

    eng = EqlbEngine(V, build_patches(msh))
    x_elem = np.asarray(eng.equilibrate(dp, dr, fk, bv))

    monkeypatch.setitem(os.environ, "EQLB_FORCE_LANE_SELECT", "1")
    eng2 = EqlbEngine(V, build_patches(msh))
    x_ls = np.asarray(eng2.equilibrate(dp, dr, fk, bv))
    assert np.abs(x_elem - x_ls).max() < 1e-11
