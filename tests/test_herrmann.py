"""Herrmann displacement-pressure primal formulation (reference
``demo/elasticity/demo_reconstruction.py:353-377``): Taylor-Hood
P_{k+1} x P_k MINRES solve, stress rows sigma = 2 eps(u) + p I, stress
equilibration invariants, and the guaranteed bound with the C_a-weighted
constitutive-mismatch term (``demo_error_estimation.py:113-119``)."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    check_divergence_condition,
    check_jump_condition,
    check_weak_symmetry_condition,
)
from dolfinx_eqlb_tpu.estimation import estimate_elasticity
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    as_vector,
    expr_from_callable,
    local_projection,
)
from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.models.elasticity import (
    ElasticitySolverUP,
    pressure_mismatch_expr,
    stress_row_expr_up,
)

PI_1 = 1.0


def u_exact(x):
    return np.stack(
        [
            np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
            -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1]),
        ],
        -1,
    )


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def _energy_error_up(msh, uh, ph):
    from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

    pts, w = gauss_triangle(12)
    xq = msh.map_points(pts)
    g = np.asarray(uh.evaluate_grad(pts))
    pi, c, s_ = np.pi, np.cos, np.sin
    gex = np.empty_like(g)
    gex[..., 0, 0] = pi * c(pi * xq[..., 0]) * c(pi * xq[..., 1])
    gex[..., 0, 1] = -pi * s_(pi * xq[..., 0]) * s_(pi * xq[..., 1])
    gex[..., 1, 0] = pi * s_(pi * xq[..., 0]) * s_(pi * xq[..., 1])
    gex[..., 1, 1] = -pi * c(pi * xq[..., 0]) * c(pi * xq[..., 1])
    de = g - gex
    eps = 0.5 * (de + np.swapaxes(de, -1, -2))
    dp = np.asarray(ph.evaluate(pts))[..., 0] / PI_1  # div u_exact = 0
    dens = 2.0 * np.einsum("cqab,cqab->cq", eps, eps) + dp**2
    return float(np.sqrt(np.einsum("q,cq,c->", w, dens, np.abs(msh.detJ))))


@pytest.mark.parametrize("order_prime", [2])
def test_herrmann_equilibration_and_bound(order_prime):
    degree = 2
    errs, etas = [], []
    for n in (3, 6):
        msh = unit_square(n)
        Vu = FunctionSpace(msh, "P", order_prime + 1, vs=2)
        Vp = FunctionSpace(msh, "P", order_prime)
        Vf = FunctionSpace(msh, "DG", degree - 1, vs=2)
        Vr = FunctionSpace(msh, "DG", degree - 1)
        rhs_proj = local_projection(
            Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
            quadrature_degree=2 * degree + 8,
        )
        solver = ElasticitySolverUP(Vu, Vp, PI_1)
        uh, ph = solver.solve(
            as_vector(rhs_proj, msh), msh.boundary_facets,
            expr_from_callable(u_exact, msh, value_size=2), rtol=1e-12,
        )
        assert solver.last_residual < 1e-9

        sigma_proj = local_projection(
            Vf,
            [stress_row_expr_up(uh, ph, 0, -1.0),
             stress_row_expr_up(uh, ph, 1, -1.0)],
        )
        eq = FluxEqlbSE(degree, msh, rhs_proj, sigma_proj,
                        equilibrate_stress=True, estimate_korn_constant=True)
        eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
        eq.equilibrate_fluxes()
        for i in range(2):
            assert check_divergence_condition(
                eq.list_flux[i], sigma_proj[i], rhs_proj[i]
            )
            assert check_jump_condition(eq.list_flux[i], sigma_proj[i])
        assert check_weak_symmetry_condition(eq.list_flux, sigma_proj)

        eta, comps, _ = estimate_elasticity(
            [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
            PI_1, sigma_proj, eq.list_flux, eq.get_korn_constants(),
            pressure_term=pressure_mismatch_expr(uh, ph, PI_1),
        )
        err = _energy_error_up(msh, uh, ph)
        assert eta >= err, "guaranteed bound violated"
        errs.append(err)
        etas.append(eta)
    # the bound and the error both decrease under refinement
    assert etas[1] < etas[0] and errs[1] < errs[0]
