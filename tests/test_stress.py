"""Weakly symmetric stress equilibration tests (the reference's
``test_stressqlb_conditions.py`` strategy): row-wise divergence and jump
conditions plus the weak-symmetry condition (sigma_01 - sigma_10, v) = 0 for
all continuous-P1 v, and Korn-constant estimation sanity."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.mesh.generators import unit_square_unstructured
from dolfinx_eqlb_tpu.fem import FunctionSpace, local_projection, expr_from_callable
from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    check_divergence_condition,
    check_jump_condition,
    check_weak_symmetry_condition,
)


def _sigma_rows(deg):
    """Exact symmetric polynomial stress sigma = [[a, c], [c, b]] with
    a = x^d + 2y, b = y^d - x, c = x*y, and its divergence rows
    f0 = d x^{d-1} + x, f1 = y + d y^{d-1} (deg=2 reproduces the historic
    quadratic case; higher degrees exercise the top moments)."""
    d = deg

    def row0(x):
        return np.stack([x[..., 0] ** d + 2 * x[..., 1],
                         x[..., 0] * x[..., 1]], -1)

    def row1(x):
        return np.stack([x[..., 0] * x[..., 1],
                         x[..., 1] ** d - x[..., 0]], -1)

    f0 = lambda x: d * x[..., 0] ** (d - 1) + x[..., 0]
    f1 = lambda x: x[..., 1] + d * x[..., 1] ** (d - 1)
    return (row0, row1), (f0, f1)


@pytest.mark.parametrize("mesh_fn", [
    lambda: unit_square(3),
    lambda: permute_vertices(unit_square(3), seed=21),
    lambda: unit_square_unstructured(4, seed=1),
])
@pytest.mark.parametrize("deg", [2, 3, 4])  # reference sweeps 2-4
def test_stress_equilibration_conditions(mesh_fn, deg):
    msh = mesh_fn()
    (row0, row1), (f0, f1) = _sigma_rows(deg)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    rhs = local_projection(Vr, [f0, f1], quadrature_degree=8)
    proj = local_projection(
        Vf,
        [
            expr_from_callable(row0, msh, value_size=2),
            expr_from_callable(row1, msh, value_size=2),
        ],
        quadrature_degree=8,
    )
    eq = FluxEqlbSE(deg, msh, rhs, proj, equilibrate_stress=True,
                    estimate_korn_constant=True)
    # primal Dirichlet everywhere (free flux on boundary)
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()

    for i in range(2):
        assert check_divergence_condition(eq.list_flux[i], proj[i], rhs[i]), (
            "divergence", i,
            check_divergence_condition(eq.list_flux[i], proj[i], rhs[i], return_error=True),
        )
        assert check_jump_condition(eq.list_flux[i], proj[i]), ("jump", i)
    assert check_weak_symmetry_condition(eq.list_flux, proj), "weak symmetry"

    korn = eq.get_korn_constants()
    vals = np.asarray(korn.evaluate(np.array([[1 / 3, 1 / 3]])))[:, 0, 0]
    assert (vals > 1.0).all() and (vals < 1e3).all()


@pytest.mark.parametrize("deg", [2])
def test_stress_without_symmetry_violates(deg):
    """Sanity: without the weak-symmetry step the condition generally fails
    (so the test above actually exercises the correction)."""
    msh = unit_square(3)
    (row0, row1), (f0, f1) = _sigma_rows(deg)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    rhs = local_projection(Vr, [f0, f1], quadrature_degree=8)
    proj = local_projection(
        Vf,
        [
            expr_from_callable(row0, msh, value_size=2),
            expr_from_callable(row1, msh, value_size=2),
        ],
        quadrature_degree=8,
    )
    eq = FluxEqlbSE(deg, msh, rhs, proj, equilibrate_stress=False)
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()
    assert not check_weak_symmetry_condition(eq.list_flux, proj, atol=1e-12)
