"""Local projection / interpolation tests.

Mirrors the reference's ``test_localsolver_projection.py`` strategy
(SURVEY.md section 4): cell-local projection must reproduce polynomials
exactly and agree with the analytic L2 projection; RT interpolation must be
exact on RT functions (round-trip).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    Function,
    local_projection,
    interpolate,
    expr_from_callable,
    assemble_scalar,
    cell_integrals_sq,
    grad,
    div,
)


MESHES = [
    lambda: unit_square(3),
    lambda: permute_vertices(unit_square(3), seed=7),
]


@pytest.mark.parametrize("mesh_fn", MESHES)
@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_dg_projection_poly_exact(mesh_fn, deg):
    msh = mesh_fn()
    V = FunctionSpace(msh, "DG", deg)

    def f(x):
        return (1.0 + x[..., 0] + x[..., 1]) ** deg

    u = local_projection(V, [f])[0]
    pts = np.array([[0.1, 0.2], [0.3, 0.3], [0.25, 0.5], [0.0, 0.0]])
    got = u.evaluate(pts)[..., 0]
    xq = msh.map_points(pts)
    assert np.allclose(got, f(xq), atol=1e-11)


@pytest.mark.parametrize("mesh_fn", MESHES)
def test_dg_projection_nonpoly_best_approx(mesh_fn):
    """Projection == global L2 best approximation cell-wise: the residual
    must be L2-orthogonal to the DG space."""
    msh = mesh_fn()
    V = FunctionSpace(msh, "DG", 2)

    def f(x):
        return np.sin(2 * np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1])

    u = local_projection(V, [f], quadrature_degree=12)[0]
    err = expr_from_callable(f, msh) - u
    # orthogonality against a DG-2 test function
    w = Function(V, jnp.asarray(np.random.default_rng(0).normal(size=V.ndofs)))
    val = assemble_scalar(err * w, 14)
    assert abs(val) < 1e-12


@pytest.mark.parametrize("mesh_fn", MESHES)
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_vector_dg_projection(mesh_fn, deg):
    msh = mesh_fn()
    V = FunctionSpace(msh, "DG", deg, vs=2)

    def f(x):
        return np.stack(
            [x[..., 0] ** deg, (x[..., 0] + x[..., 1]) ** deg], axis=-1
        )

    u = local_projection(V, [expr_from_callable(f, msh, value_size=2)])[0]
    pts = np.array([[0.2, 0.3], [0.5, 0.25]])
    got = u.evaluate(pts)
    assert np.allclose(got, f(msh.map_points(pts)), atol=1e-11)


@pytest.mark.parametrize("mesh_fn", MESHES)
@pytest.mark.parametrize("family", ["RT", "DRT"])
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_rt_interpolation_roundtrip(mesh_fn, family, deg):
    """Interpolate a random member of the space: must reproduce its dofs
    (reference test_hierarchic_rt.py:165-264 on-mesh round-trip)."""
    msh = mesh_fn()
    V = FunctionSpace(msh, family, deg)
    rng = np.random.default_rng(5)
    u = Function(V, jnp.asarray(rng.normal(size=V.ndofs)))
    v = interpolate(V, u)
    if family == "RT":
        assert np.allclose(np.asarray(v.x), np.asarray(u.x), atol=1e-9)
    else:
        assert np.allclose(np.asarray(v.x), np.asarray(u.x), atol=1e-9)
    # values agree too
    pts = np.array([[0.3, 0.3], [0.1, 0.6]])
    assert np.allclose(
        np.asarray(v.evaluate(pts)), np.asarray(u.evaluate(pts)), atol=1e-9
    )


@pytest.mark.parametrize("mesh_fn", MESHES)
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_rt_conformity_of_random_member(mesh_fn, deg):
    """Normal trace of a conforming RT function must be continuous across
    every interior facet (validates dofmap orientation signs)."""
    msh = mesh_fn()
    V = FunctionSpace(msh, "RT", deg)
    rng = np.random.default_rng(3)
    u = Function(V, jnp.asarray(rng.normal(size=V.ndofs)))

    from dolfinx_eqlb_tpu.elements.quadrature import facet_param_points

    s = np.linspace(0.15, 0.85, deg + 2)
    pts_e = facet_param_points(s)
    vals = [np.asarray(u.evaluate(pts_e[e])) for e in range(3)]  # (nc,nq,2)
    for f in range(msh.num_facets):
        c1 = msh.facet_cells[f, 1]
        if c1 < 0:
            continue
        c0 = msh.facet_cells[f, 0]
        T = msh.facet_tangent[f]
        rotT = np.array([T[1], -T[0]])
        tr = []
        for c, side in ((c0, 0), (c1, 1)):
            e = msh.facet_local[f, side]
            v = vals[e][c]  # (nq, 2) along local direction
            if not msh.edge_aligned[c, e]:
                v = v[::-1]
            tr.append(v @ rotT)
        assert np.allclose(tr[0], tr[1], atol=1e-10), f


@pytest.mark.parametrize("mesh_fn", MESHES)
def test_p_interpolation_and_grad(mesh_fn):
    msh = mesh_fn()
    V = FunctionSpace(msh, "P", 3)

    def f(x):
        return x[..., 0] ** 3 - 2 * x[..., 0] * x[..., 1] ** 2 + 1.0

    u = interpolate(V, f)
    pts = np.array([[0.2, 0.2], [0.4, 0.5]])
    assert np.allclose(
        np.asarray(u.evaluate(pts))[..., 0], f(msh.map_points(pts)), atol=1e-10
    )
    # gradient check via estimator utility
    def gref(x):
        return np.stack(
            [3 * x[..., 0] ** 2 - 2 * x[..., 1] ** 2, -4 * x[..., 0] * x[..., 1]],
            axis=-1,
        )

    err = grad(u) - expr_from_callable(gref, msh, value_size=2)
    assert float(cell_integrals_sq(err, 8).sum()) < 1e-20


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_rt_divergence_evaluation(deg):
    """Interpolation reproduces a global member of RT_k = P_{k-1}^2 +
    x P~_{k-1}, values and divergence (checks the Piola maps + signs)."""
    msh = permute_vertices(unit_square(2), seed=2)
    V = FunctionSpace(msh, "RT", deg)
    k = deg

    def f(x):
        s = (x[..., 0] + x[..., 1]) ** (k - 1)
        return np.stack(
            [x[..., 0] * s + x[..., 1] ** (k - 1), x[..., 1] * s + x[..., 0] ** (k - 1)],
            axis=-1,
        )

    def divf(x):
        return (k + 1) * (x[..., 0] + x[..., 1]) ** (k - 1)

    e = expr_from_callable(f, msh, value_size=2)
    e.evaluate_div = lambda q: jnp.asarray(divf(msh.map_points(np.asarray(q))))[..., None]
    u = interpolate(V, e)
    pts = np.array([[0.25, 0.25], [0.1, 0.7]])
    got = np.asarray(u.evaluate_div(pts))[..., 0]
    assert np.allclose(got, divf(msh.map_points(pts)), atol=1e-9)
    got_v = np.asarray(u.evaluate(pts))
    assert np.allclose(got_v, f(msh.map_points(pts)), atol=1e-9)
