"""Boundary-condition evaluation tests.

Mirrors ``test_fluxeqlb_bcond.py`` (polynomial BC data reproduced exactly,
non-polynomial data via projection) and ``test_stressqlb_bcond.py`` (mixed
Dirichlet/traction layouts for weakly symmetric stress equilibration)."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.mesh.generators import unit_square_unstructured
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    local_projection,
    expr_from_callable,
)
from dolfinx_eqlb_tpu.models import ElasticitySolver, stress_row_expr
from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    FluxEqlbEV,
    fluxbc,
    check_divergence_condition,
    check_jump_condition,
    check_boundary_conditions,
    check_weak_symmetry_condition,
)


@pytest.mark.parametrize("deg", [1, 2, 3, 4])  # reference sweeps 1-4
@pytest.mark.parametrize("Eqlb", [FluxEqlbSE, FluxEqlbEV])
@pytest.mark.parametrize("mesh_fn", [
    lambda: permute_vertices(unit_square(3), seed=41),
    lambda: unit_square_unstructured(4, seed=1),
])
def test_polynomial_bc_exact(deg, Eqlb, mesh_fn):
    """Flux BC with polynomial normal trace of degree <= k-1 is reproduced
    exactly by the equilibrated flux (reference test_fluxeqlb_bcond.py:32,
    degrees 1-4 on both mesh families)."""
    msh = mesh_fn()
    k = deg
    # sigma = (x^... ) with polynomial trace of degree k-1 on x = 0/1:
    sig = lambda x: np.stack(
        [x[..., 1] ** (k - 1) + 1.0, x[..., 0] * 0.0], -1
    )
    f = lambda x: np.zeros(x.shape[:-1])  # div sigma = 0
    Vr = FunctionSpace(msh, "DG", k - 1)
    Vf = FunctionSpace(msh, "DG", k - 1, vs=2)
    rhs = local_projection(Vr, [f])
    proj = local_projection(Vf, [expr_from_callable(sig, msh, value_size=2)],
                            quadrature_degree=2 * k + 4)
    left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
    right = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 1.0))
    others = np.setdiff1d(msh.boundary_facets, np.concatenate([left, right]))
    # sigma.n_out: left n=(-1,0): -(y^{k-1}+1); right: +(y^{k-1}+1)
    gl = lambda x: -(x[..., 1] ** (k - 1) + 1.0)
    gr = lambda x: x[..., 1] ** (k - 1) + 1.0
    eq = Eqlb(k, msh, rhs, proj)
    eq.set_boundary_conditions(
        [others],
        [[fluxbc(gl, left, None, quadrature_degree=2 * k + 4),
          fluxbc(gr, right, None, quadrature_degree=2 * k + 4)]],
    )
    eq.equilibrate_fluxes()
    bfcts = np.concatenate([left, right])
    assert check_boundary_conditions(
        eq.list_flux[0], proj[0], eq.list_bfunctions[0], bfcts
    )
    assert check_divergence_condition(eq.list_flux[0], proj[0], rhs[0])


# manufactured solution with LINEAR stress (traces in P1 = RT2 facet space):
# u = (x^2, -2xy), sigma = 2 eps = [[4x, -2y], [-2y, -4x]], body force
# f = -div sigma = (-2, 0)
u_ext = lambda x: np.stack([x[..., 0] ** 2, -2 * x[..., 0] * x[..., 1]], -1)
f_body = lambda x: np.stack([-2.0 + 0 * x[..., 0], 0 * x[..., 0]], -1)


def _sig(x):
    z = np.zeros(x.shape[:-1])
    return np.stack(
        [
            np.stack([4 * x[..., 0], -2 * x[..., 1]], -1),
            np.stack([-2 * x[..., 1], -4 * x[..., 0]], -1),
        ],
        -2,
    )


_SIDES = {
    "left": (lambda x: np.isclose(x[..., 0], 0.0), np.array([-1.0, 0.0])),
    "right": (lambda x: np.isclose(x[..., 0], 1.0), np.array([1.0, 0.0])),
    "bottom": (lambda x: np.isclose(x[..., 1], 0.0), np.array([0.0, -1.0])),
    "top": (lambda x: np.isclose(x[..., 1], 1.0), np.array([0.0, 1.0])),
}


@pytest.mark.parametrize("traction_sides", [
    ("right",),
    ("right", "top"),
])
def test_stress_bc_layouts(traction_sides):
    """Mixed Dirichlet/traction layouts (reference test_stressqlb_bcond
    sweeps 12 such combinations on the unit square).  Pure-traction corner
    patches (2 cells) cannot satisfy the weak-symmetry constraints at
    degree 2 — the reference groups them; here the mesh is pre-refined
    (refine_for_stress), which the equilibrator enforces."""
    from dolfinx_eqlb_tpu.eqlb.patches import refine_for_stress

    msh = unit_square(2)
    tr_facets = np.concatenate([
        msh.locate_boundary_facets(_SIDES[s][0]) for s in traction_sides
    ])
    msh = refine_for_stress(msh, tr_facets)
    deg = 2
    V = FunctionSpace(msh, "P", 2, vs=2)  # primal exact: u quadratic
    tr = []
    dir_facets = []
    for name, (loc, n) in _SIDES.items():
        fcts = msh.locate_boundary_facets(loc)
        if name in traction_sides:
            tr.append((fcts, lambda x, n=n: _sig(x) @ n))
        else:
            dir_facets.append(fcts)
    dir_facets = np.concatenate(dir_facets)
    solver = ElasticitySolver(V, 1.0)
    uh = solver.solve(
        expr_from_callable(f_body, msh, value_size=2),
        dir_facets,
        expr_from_callable(u_ext, msh, value_size=2),
        tractions=tr,
        rtol=1e-13,
    )
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", deg - 1)
    sigma_proj = local_projection(
        Vf, [stress_row_expr(uh, 1.0, 0, -1.0), stress_row_expr(uh, 1.0, 1, -1.0)]
    )
    rhs_proj = local_projection(
        Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]]
    )
    eq = FluxEqlbSE(deg, msh, rhs_proj, sigma_proj,
                    equilibrate_stress=True, estimate_korn_constant=True)
    bcs = [[], []]
    for name, (loc, n) in _SIDES.items():
        if name not in traction_sides:
            continue
        fcts = msh.locate_boundary_facets(loc)
        for row in (0, 1):
            # equilibrated rows are -sigma rows: row_i . n_out = -t_i
            bcs[row].append(
                fluxbc(lambda x, n=n, row=row: -(_sig(x) @ n)[..., row],
                       fcts, None, quadrature_degree=8)
            )
    eq.set_boundary_conditions([dir_facets, dir_facets], bcs)
    eq.equilibrate_fluxes()

    for i in range(2):
        assert check_divergence_condition(
            eq.list_flux[i], sigma_proj[i], rhs_proj[i]
        ), (traction_sides, i, check_divergence_condition(
            eq.list_flux[i], sigma_proj[i], rhs_proj[i], return_error=True))
        assert check_jump_condition(eq.list_flux[i], sigma_proj[i])
        bfcts = np.where(eq.boundary_data.facet_kind[i] == 2)[0]
        if len(bfcts):
            assert check_boundary_conditions(
                eq.list_flux[i], sigma_proj[i], eq.list_bfunctions[i], bfcts
            ), (traction_sides, i)
    assert check_weak_symmetry_condition(eq.list_flux, sigma_proj)


def test_nonpolynomial_bc_projection():
    """Non-polynomial BC data through the projection path (reference
    ``test_fluxeqlb_bcond.py`` non-polynomial cases): a callable trace is
    projected onto the facet Legendre moments by quadrature; the resulting
    boundary dofs must match an independent facet-trace projection, and
    raising the quadrature degree must converge to the exact moments."""
    import numpy as np
    from dolfinx_eqlb_tpu.eqlb.bcs import boundarydata, fluxbc
    from dolfinx_eqlb_tpu.fem import FunctionSpace, project_facet_trace
    from dolfinx_eqlb_tpu.mesh import unit_square

    msh = unit_square(3)
    k = 3
    V = FunctionSpace(msh, "RT", k)
    left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
    g = lambda x: np.exp(np.sin(3.0 * x[..., 1]))  # non-polynomial trace

    bc = fluxbc(g, left, None, requires_projection=True, quadrature_degree=20)
    other = np.setdiff1d(msh.boundary_facets, left)
    bd = boundarydata([[bc]], V, [other])

    # independent projection of the trace onto P_{k-1} per facet
    coef = np.asarray(project_facet_trace(msh, left, g, k))
    sgn = msh.boundary_outward_sign[left] * msh.facet_length[left]
    expected = sgn[:, None] * coef[:, :k] / (2.0 * np.arange(k) + 1.0)
    assert np.allclose(bd.bvals[0, left], expected, atol=1e-12), (
        np.abs(bd.bvals[0, left] - expected).max()
    )
    # low-degree quadrature differs (projection not resolved), high converges
    bc_lo = fluxbc(g, left, None, quadrature_degree=2)
    bd_lo = boundarydata([[bc_lo]], V, [other])
    assert not np.allclose(bd_lo.bvals[0, left], expected, atol=1e-12)
