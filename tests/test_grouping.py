"""Patch grouping for deficient pure-traction boundary patches.

A crossed unit square with traction data on the left and bottom sides has
2-cell pure-traction corner patches at (0,0), (0,1) and (1,0) — exactly the
configuration the reference handles by patch grouping
(``se/reconstruction.hpp:166-234``) and round 1 of this framework rejected
with "Incompatible mesh".  The stress data is linear (exactly representable
in DG_1), so all invariants must hold to solver precision WITHOUT refining
the mesh.
"""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    check_boundary_conditions,
    check_divergence_condition,
    check_jump_condition,
    check_weak_symmetry_condition,
    fluxbc,
)
from dolfinx_eqlb_tpu.eqlb.grouping import build_groups
from dolfinx_eqlb_tpu.fem import FunctionSpace, expr_from_callable, local_projection
from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.mesh.generators import unit_square_unstructured


def _linear_stress():
    """sigma = [[x, y], [y, 2 - x]]: symmetric, rows linear, divergences
    constant -> all projections at k = 2 are exact (no compatibility
    residual on pure-traction patches)."""
    row0 = lambda x: np.stack([x[..., 0], x[..., 1]], -1)
    row1 = lambda x: np.stack([x[..., 1], 2.0 - x[..., 0]], -1)
    f0 = lambda x: 2.0 * np.ones(x.shape[:-1])
    f1 = lambda x: np.zeros(x.shape[:-1])
    return (row0, row1), (f0, f1)


@pytest.mark.parametrize("mesh_fn", [
    lambda: unit_square(3),
    lambda: permute_vertices(unit_square(3), seed=5),
])
def test_grouped_corner_patches(mesh_fn):
    msh = mesh_fn()
    deg = 2
    (row0, row1), (f0, f1) = _linear_stress()
    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    rhs = local_projection(Vr, [f0, f1], quadrature_degree=6)
    proj = local_projection(
        Vf,
        [expr_from_callable(row0, msh, value_size=2),
         expr_from_callable(row1, msh, value_size=2)],
        quadrature_degree=6,
    )
    left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
    bot = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 0.0))
    right = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 1.0))
    top = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 1.0))
    prime = np.concatenate([right, top])
    traction = np.concatenate([left, bot])

    # traction g_i = sigma_i . n_out: left n = (-1,0), bottom n = (0,-1)
    bcs = [
        [fluxbc(lambda x: -row0(x)[..., 0], left, None),
         fluxbc(lambda x: -row0(x)[..., 1], bot, None)],
        [fluxbc(lambda x: -row1(x)[..., 0], left, None),
         fluxbc(lambda x: -row1(x)[..., 1], bot, None)],
    ]

    eq = FluxEqlbSE(deg, msh, rhs, proj, equilibrate_stress=True)
    eq.set_boundary_conditions([prime, prime], bcs)

    # the corner patches really are deficient (round 1 raised here)
    groups, skip = build_groups(eq.engine, eq.boundary_data.facet_kind[:2])
    assert len(groups) >= 1 and len(skip) >= 1

    eq.equilibrate_fluxes()
    for i in range(2):
        assert check_divergence_condition(eq.list_flux[i], proj[i], rhs[i]), (
            "divergence", i,
            check_divergence_condition(
                eq.list_flux[i], proj[i], rhs[i], return_error=True
            ),
        )
        assert check_jump_condition(eq.list_flux[i], proj[i]), ("jump", i)
        assert check_boundary_conditions(
            eq.list_flux[i], proj[i], eq.list_bfunctions[i],
            np.asarray(traction, dtype=np.int64),
        ), ("bc", i)
    assert check_weak_symmetry_condition(eq.list_flux, proj), "weak symmetry"


def test_grouped_unstructured():
    """Unstructured fixture with an all-traction boundary except one primal
    side — exercises grouping on irregular corner patches."""
    msh = unit_square_unstructured(4, seed=2)
    deg = 2
    (row0, row1), (f0, f1) = _linear_stress()
    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    rhs = local_projection(Vr, [f0, f1], quadrature_degree=6)
    proj = local_projection(
        Vf,
        [expr_from_callable(row0, msh, value_size=2),
         expr_from_callable(row1, msh, value_size=2)],
        quadrature_degree=6,
    )
    left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
    bot = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 0.0))
    top = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 1.0))
    prime = np.concatenate(
        [msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 1.0)), top]
    )
    bcs = [
        [fluxbc(lambda x: -row0(x)[..., 0], left, None),
         fluxbc(lambda x: -row0(x)[..., 1], bot, None)],
        [fluxbc(lambda x: -row1(x)[..., 0], left, None),
         fluxbc(lambda x: -row1(x)[..., 1], bot, None)],
    ]
    eq = FluxEqlbSE(deg, msh, rhs, proj, equilibrate_stress=True)
    eq.set_boundary_conditions([prime, prime], bcs)
    eq.equilibrate_fluxes()
    for i in range(2):
        assert check_divergence_condition(eq.list_flux[i], proj[i], rhs[i])
        assert check_jump_condition(eq.list_flux[i], proj[i])
    assert check_weak_symmetry_condition(eq.list_flux, proj), "weak symmetry"
