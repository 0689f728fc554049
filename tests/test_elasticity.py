"""Elasticity: primal solver + full weakly-symmetric stress equilibration
driven by a real primal solve (the reference's ``test_stressqlb_conditions``
end-to-end path), plus Korn constants and the guaranteed estimator."""

import numpy as np
import jax.numpy as jnp
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    local_projection,
    expr_from_callable,
    cell_integrals_sq,
)
from dolfinx_eqlb_tpu.models import ElasticitySolver, stress_row_expr
from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    check_divergence_condition,
    check_jump_condition,
    check_weak_symmetry_condition,
)
from dolfinx_eqlb_tpu.estimation import estimate_elasticity

PI_1 = 1.0

# manufactured solution u = (x^2 y, -x y^2): div u = 0,
# sigma = 2 eps = [[4xy, x^2-y^2], [x^2-y^2, -4xy]], body force f = -div sigma
u_ext = lambda x: np.stack([x[..., 0] ** 2 * x[..., 1], -x[..., 0] * x[..., 1] ** 2], -1)
f_body = lambda x: np.stack([-2 * x[..., 1], 2 * x[..., 0]], -1)
sig_ex = lambda x: np.stack(
    [
        np.stack([4 * x[..., 0] * x[..., 1], x[..., 0] ** 2 - x[..., 1] ** 2], -1),
        np.stack([x[..., 0] ** 2 - x[..., 1] ** 2, -4 * x[..., 0] * x[..., 1]], -1),
    ],
    -2,
)


def test_elasticity_polynomial_exact():
    msh = permute_vertices(unit_square(3), seed=31)
    V = FunctionSpace(msh, "P", 3, vs=2)
    solver = ElasticitySolver(V, PI_1)
    uh = solver.solve(
        expr_from_callable(f_body, msh, value_size=2),
        msh.boundary_facets,
        expr_from_callable(u_ext, msh, value_size=2),
        rtol=1e-13,
    )
    err = expr_from_callable(u_ext, msh, value_size=2) - uh
    assert float(cell_integrals_sq(err, 10).sum()) < 1e-20


@pytest.mark.parametrize("mesh_fn", [
    lambda: unit_square(3),
    lambda: permute_vertices(unit_square(3), seed=33),
])
def test_stress_equilibration_end_to_end(mesh_fn):
    msh = mesh_fn()
    deg = 2  # flux degree; primal P2 (stress eqlb needs primal >= 2)
    V = FunctionSpace(msh, "P", 3, vs=2)  # exact primal: isolates eqlb errors
    solver = ElasticitySolver(V, PI_1)
    uh = solver.solve(
        expr_from_callable(f_body, msh, value_size=2),
        msh.boundary_facets,
        expr_from_callable(u_ext, msh, value_size=2),
        rtol=1e-13,
    )

    # project the NEGATED stress rows and the body force rows (reference
    # elasticity demo_reconstruction.py:480-505)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    sigma_proj = local_projection(
        Vf, [stress_row_expr(uh, PI_1, 0, -1.0), stress_row_expr(uh, PI_1, 1, -1.0)]
    )
    rhs_proj = local_projection(
        Vr,
        [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
    )
    eq = FluxEqlbSE(
        deg, msh, rhs_proj, sigma_proj,
        equilibrate_stress=True, estimate_korn_constant=True,
    )
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()

    for i in range(2):
        assert check_divergence_condition(
            eq.list_flux[i], sigma_proj[i], rhs_proj[i]
        ), check_divergence_condition(
            eq.list_flux[i], sigma_proj[i], rhs_proj[i], return_error=True
        )
        assert check_jump_condition(eq.list_flux[i], sigma_proj[i])
    assert check_weak_symmetry_condition(eq.list_flux, sigma_proj)

    # guaranteed estimator runs; with an exact primal the remaining eta is
    # pure projection error of sigma into DG_{k-1} (O(h^2) here, not zero —
    # the reference projects into DG_{degree-1} too, elasticity
    # demo_reconstruction.py:478-489) and the oscillation term vanishes
    eta, comps, cells = estimate_elasticity(
        [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
        PI_1,
        sigma_proj,
        eq.list_flux,
        eq.get_korn_constants(),
    )
    assert np.isfinite(eta) and eta > 0
    assert comps[2] < 1e-9  # oscillation: f is resolved exactly


def test_stress_equilibration_estimator_bounds():
    """Inexact primal (P2 for a cubic solution): the guaranteed bound must
    dominate the true energy error (efficiency index >= 1)."""
    msh = unit_square(4)
    deg = 2
    V = FunctionSpace(msh, "P", 2, vs=2)
    solver = ElasticitySolver(V, PI_1)
    uh = solver.solve(
        expr_from_callable(f_body, msh, value_size=2),
        msh.boundary_facets,
        expr_from_callable(u_ext, msh, value_size=2),
        rtol=1e-13,
    )
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    sigma_proj = local_projection(
        Vf, [stress_row_expr(uh, PI_1, 0, -1.0), stress_row_expr(uh, PI_1, 1, -1.0)]
    )
    rhs_proj = local_projection(
        Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]]
    )
    eq = FluxEqlbSE(deg, msh, rhs_proj, sigma_proj,
                    equilibrate_stress=True, estimate_korn_constant=True)
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()
    eta, comps, cells = estimate_elasticity(
        [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
        PI_1, sigma_proj, eq.list_flux, eq.get_korn_constants(),
    )
    # true energy error ||eps(u - u_h)|| (pi_1 term vanishes: div u = 0)
    def eps_err(x):
        return None

    from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle
    pts, w = gauss_triangle(10)
    g = uh.evaluate_grad(pts)
    eps_h = 0.5 * (g + jnp.swapaxes(g, -1, -2))
    xq = msh.map_points(pts)
    gex = np.stack(
        [
            np.stack([2 * xq[..., 0] * xq[..., 1], xq[..., 0] ** 2], -1),
            np.stack([-xq[..., 1] ** 2, -2 * xq[..., 0] * xq[..., 1]], -1),
        ],
        -2,
    )
    eps_ex = 0.5 * (gex + np.swapaxes(gex, -1, -2))
    de = np.asarray(eps_h) - eps_ex
    adet = np.abs(msh.detJ)
    # energy norm^2 = int 2 eps:eps + pi_1 div^2 ; div(u - u_h) = -div u_h
    divh = np.asarray(g[..., 0, 0] + g[..., 1, 1])
    err2 = np.einsum("q,c,cqab,cqab->", w, adet, de, 2 * de) + PI_1 * np.einsum(
        "q,c,cq,cq->", w, adet, divh, divh
    )
    err = np.sqrt(err2)
    ieff = eta / err
    assert ieff >= 1.0, (eta, err, ieff)
    # the guaranteed bound is dominated by the Korn-weighted weak-symmetry
    # term (cell Korn constants ~ 11-21 on this mesh, cf. the reference's
    # geometric estimate se/Patch.cpp:130-334), so the efficiency index of
    # the *guaranteed* bound is O(C_K) — just bound it sanely
    assert ieff < 100.0, (eta, err, ieff)


def _ieff_level(n, deg, order_prime=2):
    msh = unit_square(n)
    V = FunctionSpace(msh, "P", order_prime, vs=2)
    uh = ElasticitySolver(V, PI_1).solve(
        expr_from_callable(f_body, msh, value_size=2),
        msh.boundary_facets,
        expr_from_callable(u_ext, msh, value_size=2),
        rtol=1e-13,
    )
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    sigma_proj = local_projection(
        Vf, [stress_row_expr(uh, PI_1, 0, -1.0),
             stress_row_expr(uh, PI_1, 1, -1.0)]
    )
    rhs_proj = local_projection(
        Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]]
    )
    eq = FluxEqlbSE(deg, msh, rhs_proj, sigma_proj,
                    equilibrate_stress=True, estimate_korn_constant=True)
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()
    eta, _, _ = estimate_elasticity(
        [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
        PI_1, sigma_proj, eq.list_flux, eq.get_korn_constants(),
    )
    from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

    pts, w = gauss_triangle(10)
    g = np.asarray(uh.evaluate_grad(pts))
    xq = msh.map_points(pts)
    gex = np.stack(
        [np.stack([2 * xq[..., 0] * xq[..., 1], xq[..., 0] ** 2], -1),
         np.stack([-xq[..., 1] ** 2, -2 * xq[..., 0] * xq[..., 1]], -1)],
        -2,
    )
    de = g - gex
    eps = 0.5 * (de + np.swapaxes(de, -1, -2))
    dv = de[..., 0, 0] + de[..., 1, 1]
    adet = np.abs(msh.detJ)
    err = np.sqrt(
        np.einsum("q,c,cqab,cqab->", w, adet, eps, 2 * eps)
        + PI_1 * np.einsum("q,c,cq,cq->", w, adet, dv, dv)
    )
    return eta / err


def test_estimator_grade_at_one_degree_higher():
    """With eorder = porder + 1 the guaranteed bound tracks the error under
    refinement (I_eff non-increasing).  At eorder = porder the hat-weighted
    target's intrinsic O(h^{k-1}) corrector makes eta decay one order slower
    than the error for non-gradient (stress-row) data, so I_eff GROWS —
    root-cause study in scripts/diag_target_distance.py and the committed
    ConvStudyElasticity CSVs."""
    i4 = _ieff_level(4, deg=3)
    i8 = _ieff_level(8, deg=3)
    assert i8 <= i4 * 1.05, (i4, i8)
    # contrast: equal-order I_eff deteriorates on the same problem
    j4 = _ieff_level(4, deg=2)
    j8 = _ieff_level(8, deg=2)
    assert j8 > j4, (j4, j8)
