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


@pytest.mark.parametrize("k", [2, 3, 4])
@pytest.mark.parametrize("n_rhs", [1, 2, 3, 5])
def test_lane_select_matches_elem_gather(n_rhs, k, monkeypatch):
    """k = 2, 4 run the paired patch-major tables (engine._patch_major);
    k = 3 exercises the flux-major per-dof fallback."""
    msh = unit_square(5)
    V = FunctionSpace(msh, "RT", k)
    rng = np.random.default_rng(3)
    nc, ndg = msh.num_cells, k * (k + 1) // 2
    dp = rng.normal(size=(n_rhs, nc, 2, ndg))
    dr = rng.normal(size=(n_rhs, nc, ndg))
    fk = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None].repeat(
        n_rhs, 0)
    bv = np.zeros((n_rhs, msh.num_facets, k))

    eng = EqlbEngine(V, build_patches(msh))
    assert eng._patch_major == (k % 2 == 0)
    x_elem = np.asarray(eng.equilibrate(dp, dr, fk, bv))

    monkeypatch.setitem(os.environ, "EQLB_FORCE_LANE_SELECT", "1")
    # pin the PLAIN lane-select path (the f64 1-field case would otherwise
    # route through the double-single combine, covered separately below)
    monkeypatch.setitem(os.environ, "EQLB_NO_DS_COMBINE", "1")
    eng2 = EqlbEngine(V, build_patches(msh))
    x_ls = np.asarray(eng2.equilibrate(dp, dr, fk, bv))
    assert np.abs(x_elem - x_ls).max() < 1e-11


@pytest.mark.parametrize("k", [2, 4])
def test_ds_combine_matches_elem_gather(k, monkeypatch):
    """The double-single combine (f64 flat as 2Sum-compensated (hi, lo)
    f32 lane planes, engine._ds_combine) reproduces the f64 element-gather
    combine to the ~2^-48 split residual."""
    msh = unit_square(5)
    V = FunctionSpace(msh, "RT", k)
    rng = np.random.default_rng(11)
    nc, ndg = msh.num_cells, k * (k + 1) // 2
    dp = rng.normal(size=(1, nc, 2, ndg))
    dr = rng.normal(size=(1, nc, ndg))
    fk = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
    bv = np.zeros((1, msh.num_facets, k))

    eng = EqlbEngine(V, build_patches(msh))
    x_elem = np.asarray(eng.equilibrate(dp, dr, fk, bv))

    monkeypatch.setitem(os.environ, "EQLB_FORCE_LANE_SELECT", "1")
    eng2 = EqlbEngine(V, build_patches(msh))
    assert eng2._use_ds_combine(1)
    x_ds = np.asarray(eng2.equilibrate(dp, dr, fk, bv))
    scale = np.abs(x_elem).max()
    assert np.abs(x_elem - x_ds).max() < 1e-12 * scale


@pytest.mark.parametrize("n_rhs,cap_packs,groups", [
    (3, 0, [1, 1, 1]),   # nothing fits: per-field passes
    (3, 2, [1, 1, 1]),   # measured: 3 x R1 beats R2 + R1 past the cliff
    (4, 2, [2, 2]),      # pairwise packs
    (5, 2, [2, 1, 1, 1]),
])
def test_split_pack_groups_match(n_rhs, cap_packs, groups, monkeypatch):
    """Cache-cliff dispatch: cap the packed-combine source threshold so the
    multi-field routing splits into smaller packs / per-field passes (the
    1M-cell TPU regime — PROFILE_COMBINE_STRATEGIES.json measured one
    R = 3 pass at 180 ms vs 125 ms split) and pin the result against the
    element-gather default."""
    k = 2
    msh = unit_square(5)
    V = FunctionSpace(msh, "RT", k)
    rng = np.random.default_rng(7)
    nc, ndg = msh.num_cells, k * (k + 1) // 2
    dp = rng.normal(size=(n_rhs, nc, 2, ndg))
    dr = rng.normal(size=(n_rhs, nc, ndg))
    fk = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None].repeat(
        n_rhs, 0)
    bv = np.zeros((n_rhs, msh.num_facets, k))

    eng = EqlbEngine(V, build_patches(msh))
    x_elem = np.asarray(eng.equilibrate(dp, dr, fk, bv))

    monkeypatch.setitem(os.environ, "EQLB_FORCE_LANE_SELECT", "1")
    eng2 = EqlbEngine(V, build_patches(msh))
    L = eng2._combine["Lpad"]
    monkeypatch.setattr(EqlbEngine, "_pack_src_bytes_max",
                        cap_packs * L * 4.0)
    assert eng2._pack_groups(n_rhs) == groups
    x_split = np.asarray(eng2.equilibrate(dp, dr, fk, bv))
    assert np.abs(x_elem - x_split).max() < 1e-11
