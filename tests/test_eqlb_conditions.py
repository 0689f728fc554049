"""Equilibration-invariant tests (the reference's
``test_fluxeqlb_conditions.py`` strategy, SURVEY.md section 4):

solve a primal Poisson problem, project flux/RHS, equilibrate with both
strategies on both mesh families (structured crossed + reversed-edge
fixture), then verify: BCs honoured, div(sigma_R) = projected RHS, jump
condition, and (cross-check unique to this framework) EV == SE minimiser.
"""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.mesh.generators import unit_square_unstructured
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    local_projection,
    expr_from_callable,
    grad,
)
from dolfinx_eqlb_tpu.models.poisson import PoissonSolver
from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbEV,
    FluxEqlbSE,
    fluxbc,
    check_divergence_condition,
    check_jump_condition,
    check_jump_condition_per_facet,
    check_boundary_conditions,
)


def _setup(msh, order_prime, order_eqlb, bc_type="dirichlet"):
    """Solve primal Poisson with manufactured solution and project data."""
    u_ext = lambda x: np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
    f = lambda x: 8 * np.pi**2 * u_ext(x)
    # flux sigma = -grad u
    def gx(x):
        return -2 * np.pi * np.cos(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])

    k = order_eqlb
    V = FunctionSpace(msh, "P", order_prime)
    Vr = FunctionSpace(msh, "DG", k - 1)
    Vf = FunctionSpace(msh, "DG", k - 1, vs=2)
    rhs_proj = local_projection(Vr, [f], quadrature_degree=10)
    f_primal = rhs_proj[0] if k - 1 < order_prime else f

    left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
    right = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 1.0))
    bot = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 0.0))
    top = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 1.0))
    all_f = msh.boundary_facets

    solver = PoissonSolver(V)
    if bc_type == "dirichlet":
        uh = solver.solve(f_primal, all_f, u_ext, rtol=1e-13)
        fcts_prime, bcs = all_f, []
    elif bc_type == "neumann_hom":
        # u_x = 0 on x in {0,1} for this u_ext: homogeneous flux BC there
        fcts_prime = np.concatenate([bot, top])
        uh = solver.solve(f_primal, fcts_prime, u_ext, rtol=1e-13)
        bcs = [fluxbc(0.0, np.concatenate([left, right]), None)]
    elif bc_type == "neumann_inhom":
        from dolfinx_eqlb_tpu.fem import project_facet_trace

        fcts_prime = np.concatenate([bot, top])
        # gx = -u_x. Primal Neumann data is grad(u).n_out:
        #   x=0: n=(-1,0) -> -u_x = gx;   x=1: n=(1,0) -> u_x = -gx.
        # Project the trace data onto P_{k-1} per facet and use the *same*
        # data in the primal solve and the flux BCs: at k = 1 the hat
        # functions are not in P_{k-1}(facet), so this consistency is what
        # makes the pure-Neumann patches exactly compatible (the reference
        # tests use polynomial BC data of degree <= k-1 for the same reason).
        gl = project_facet_trace(msh, left, gx, k)
        gr = project_facet_trace(msh, right, lambda x: -gx(x), k)
        uh = solver.solve(
            f_primal,
            fcts_prime,
            u_ext,
            neumann=[(left, gl), (right, gr)],
            rtol=1e-13,
        )
        # flux BC prescribes sigma.n_out with sigma = -grad u: the negated
        # primal data on each side
        bcs = [fluxbc(-gl, left, None), fluxbc(-gr, right, None)]
    sigma_proj = local_projection(Vf, [-1.0 * grad(uh)])
    return uh, rhs_proj, sigma_proj, fcts_prime, bcs


MESHES = [
    ("builtin", lambda: unit_square(4)),
    ("reversed", lambda: permute_vertices(unit_square(4), seed=13)),
    # unstructured Delaunay fixture: valences 4-8, obtuse cells, reversed
    # edges (the reference's gmsh-mesh role, utils.py:96-176)
    ("unstructured", lambda: unit_square_unstructured(4, seed=1)),
]


@pytest.mark.parametrize("mesh_name,mesh_fn", MESHES)
@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("bc_type", ["dirichlet", "neumann_hom", "neumann_inhom"])
@pytest.mark.parametrize("Eqlb", [FluxEqlbSE, FluxEqlbEV])
def test_equilibration_conditions(mesh_name, mesh_fn, degree, bc_type, Eqlb):
    msh = mesh_fn()
    uh, rhs_proj, sigma_proj, fcts_prime, bcs = _setup(msh, degree, degree, bc_type)

    eq = Eqlb(degree, msh, rhs_proj, sigma_proj)
    eq.set_boundary_conditions([fcts_prime], [bcs])
    eq.equilibrate_fluxes()
    sig = eq.list_flux[0]

    assert check_divergence_condition(sig, sigma_proj[0], rhs_proj[0]), (
        "divergence",
        check_divergence_condition(sig, sigma_proj[0], rhs_proj[0], return_error=True),
    )
    if Eqlb is FluxEqlbSE:
        assert check_jump_condition(sig, sigma_proj[0]), "jump"
        assert check_jump_condition_per_facet(sig, sigma_proj[0]), "jump/facet"
    if bc_type != "dirichlet":
        bfcts = np.where(eq.boundary_data.facet_kind[0] == 2)[0]
        assert check_boundary_conditions(
            sig, sigma_proj[0], eq.list_bfunctions[0], bfcts
        ), "bc"


@pytest.mark.parametrize("degree", [1, 2])
def test_ev_se_same_minimiser(degree):
    """EV and SE solve the same local minimisation: the reconstructed fluxes
    must coincide to solver precision."""
    msh = permute_vertices(unit_square(3), seed=4)
    uh, rhs_proj, sigma_proj, fcts_prime, bcs = _setup(msh, degree, degree, "dirichlet")

    ev = FluxEqlbEV(degree, msh, rhs_proj, sigma_proj)
    ev.set_boundary_conditions([fcts_prime], [bcs])
    ev.equilibrate_fluxes()

    se = FluxEqlbSE(degree, msh, rhs_proj, sigma_proj)
    se.set_boundary_conditions([fcts_prime], [bcs])
    se.equilibrate_fluxes()

    pts = np.array([[0.25, 0.25], [0.1, 0.6], [0.4, 0.55]])
    from dolfinx_eqlb_tpu.eqlb.checks import reconstructed_flux_expr

    v_ev = np.asarray(reconstructed_flux_expr(ev.list_flux[0], sigma_proj[0]).evaluate(pts))
    v_se = np.asarray(reconstructed_flux_expr(se.list_flux[0], sigma_proj[0]).evaluate(pts))
    assert np.allclose(v_ev, v_se, atol=1e-9)


@pytest.mark.parametrize("Eqlb", [FluxEqlbSE, FluxEqlbEV])
def test_equilibration_conditions_degree4(Eqlb):
    """Degree-4 invariant coverage (reference sweeps 1-4; one mesh/BC combo
    here to bound runtime — tests/test_semiexplicit.py covers k=4 path
    agreement separately)."""
    msh = unit_square(3)
    uh, rhs_proj, sigma_proj, fcts_prime, bcs = _setup(msh, 4, 4, "neumann_inhom")
    eq = Eqlb(4, msh, rhs_proj, sigma_proj)
    eq.set_boundary_conditions([fcts_prime], [bcs])
    eq.equilibrate_fluxes()
    sig = eq.list_flux[0]
    assert check_divergence_condition(sig, sigma_proj[0], rhs_proj[0]), (
        check_divergence_condition(sig, sigma_proj[0], rhs_proj[0], return_error=True)
    )
    if Eqlb is FluxEqlbSE:
        assert check_jump_condition(sig, sigma_proj[0])
    assert check_boundary_conditions(
        sig, sigma_proj[0], eq.list_bfunctions[0],
        np.asarray(np.setdiff1d(msh.boundary_facets, fcts_prime), dtype=np.int64),
    )
