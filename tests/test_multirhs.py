"""Multi-RHS equilibration == independent single-RHS equilibrations
(reference ``test_fluxeqlb_multirhs.py``) and multi-RHS local solves ==
sequences of single solves (reference ``test_localsolver_multilhs.py``)."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.fem import FunctionSpace, local_projection, expr_from_callable
from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE, FluxEqlbEV


@pytest.mark.parametrize("deg", [1, 2, 3, 4])  # reference sweeps 1-4
# n_rhs selects the combine path: 2 = R2 lane-packed row gather,
# 3/4 = R-packed paired gather (engine._packed_combine)
@pytest.mark.parametrize("n_rhs", [2, 3, 4])
@pytest.mark.parametrize("Eqlb", [FluxEqlbSE, FluxEqlbEV])
def test_multirhs_equals_independent(deg, n_rhs, Eqlb):
    msh = permute_vertices(unit_square(3), seed=17)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    fns = [
        (lambda x: 1.0 + x[..., 0], lambda x: np.stack([x[..., 1], -x[..., 0]], -1)),
        (lambda x: x[..., 1] ** 2, lambda x: np.stack([x[..., 0] * x[..., 1], x[..., 0]], -1)),
        (lambda x: np.sin(x[..., 0]), lambda x: np.stack([np.cos(x[..., 1]), x[..., 1]], -1)),
        (lambda x: np.exp(x[..., 1]) - 1.0,
         lambda x: np.stack([x[..., 1] ** 2, np.sin(x[..., 0] + x[..., 1])], -1)),
    ][:n_rhs]
    rhs = local_projection(Vr, [f for f, _ in fns], quadrature_degree=8)
    proj = local_projection(
        Vf, [expr_from_callable(g, msh, value_size=2) for _, g in fns],
        quadrature_degree=8,
    )
    eq_all = Eqlb(deg, msh, rhs, proj)
    eq_all.set_boundary_conditions([msh.boundary_facets] * n_rhs,
                                   [[]] * n_rhs)
    eq_all.equilibrate_fluxes()
    for i in range(n_rhs):
        eq_one = Eqlb(deg, msh, [rhs[i]], [proj[i]])
        eq_one.set_boundary_conditions([msh.boundary_facets], [[]])
        eq_one.equilibrate_fluxes()
        assert np.allclose(
            np.asarray(eq_all.list_flux[i].x),
            np.asarray(eq_one.list_flux[0].x),
            atol=1e-11,
        ), i


@pytest.mark.parametrize("Eqlb", [FluxEqlbSE, FluxEqlbEV])
def test_multirhs_unstructured(Eqlb):
    """The reference's second mesh family (reversed edges): 4 simultaneous
    RHS at deg 3 equal the independent equilibrations."""
    from dolfinx_eqlb_tpu.mesh.generators import unit_square_unstructured

    deg, n_rhs = 3, 4
    msh = unit_square_unstructured(4, seed=1)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    fns = [
        (lambda x: 1.0 + x[..., 0], lambda x: np.stack([x[..., 1], -x[..., 0]], -1)),
        (lambda x: x[..., 1] ** 2, lambda x: np.stack([x[..., 0] * x[..., 1], x[..., 0]], -1)),
        (lambda x: np.sin(x[..., 0]), lambda x: np.stack([np.cos(x[..., 1]), x[..., 1]], -1)),
        (lambda x: np.exp(x[..., 1]) - 1.0,
         lambda x: np.stack([x[..., 1] ** 2, np.sin(x[..., 0] + x[..., 1])], -1)),
    ]
    rhs = local_projection(Vr, [f for f, _ in fns], quadrature_degree=8)
    proj = local_projection(
        Vf, [expr_from_callable(g, msh, value_size=2) for _, g in fns],
        quadrature_degree=8,
    )
    eq_all = Eqlb(deg, msh, rhs, proj)
    eq_all.set_boundary_conditions([msh.boundary_facets] * n_rhs,
                                   [[]] * n_rhs)
    eq_all.equilibrate_fluxes()
    for i in range(n_rhs):
        eq_one = Eqlb(deg, msh, [rhs[i]], [proj[i]])
        eq_one.set_boundary_conditions([msh.boundary_facets], [[]])
        eq_one.equilibrate_fluxes()
        assert np.allclose(
            np.asarray(eq_all.list_flux[i].x),
            np.asarray(eq_one.list_flux[0].x),
            atol=1e-11,
        ), i


def test_local_projection_multirhs():
    msh = unit_square(3)
    V = FunctionSpace(msh, "DG", 2)
    fns = [lambda x: x[..., 0] ** 2, lambda x: np.exp(x[..., 1]),
           lambda x: x[..., 0] * x[..., 1]]
    together = local_projection(V, fns, quadrature_degree=10)
    for i, f in enumerate(fns):
        alone = local_projection(V, [f], quadrature_degree=10)[0]
        assert np.allclose(np.asarray(together[i].x), np.asarray(alone.x))
