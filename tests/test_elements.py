"""Element-construction tests.

Mirrors the verification strategy of the reference's
``python/test/unit/test_hierarchic_rt.py`` (SURVEY.md section 4): the custom
hierarchic RT element must be unisolvent, dual to its functionals, reproduce
the full RT_k space, and its facet dofs must determine the normal trace.
"""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.elements.polynomials import (
    dubiner_basis,
    legendre_shifted,
    poly_eval,
    poly_mul,
    tri_integrate,
)
from dolfinx_eqlb_tpu.elements.quadrature import (
    REF_EDGE_ROTT,
    facet_param_points,
    gauss_interval,
    gauss_triangle,
)
from dolfinx_eqlb_tpu.elements.lagrange import LagrangeTri, DubinerTri
from dolfinx_eqlb_tpu.elements.rt import HierarchicRT


def test_tri_quadrature_exact():
    import math

    for deg in range(1, 12):
        pts, w = gauss_triangle(deg)
        for i in range(deg + 1):
            for j in range(deg + 1 - i):
                exact = math.factorial(i) * math.factorial(j) / math.factorial(i + j + 2)
                got = np.sum(w * pts[:, 0] ** i * pts[:, 1] ** j)
                assert abs(got - exact) < 1e-14


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4, 5])
def test_dubiner_orthonormal(deg):
    modes = dubiner_basis(deg)
    n = len(modes)
    assert n == (deg + 1) * (deg + 2) // 2
    pts, w = gauss_triangle(2 * deg)
    vals = np.array([poly_eval(C, pts) for C in modes])
    G = np.einsum("q,iq,jq->ij", w, vals, vals)
    assert np.allclose(G, np.eye(n), atol=1e-12)
    # exact (monomial-integral) check at looser tol: large-coefficient
    # products carry ~1e-12 cancellation error in tri_integrate
    for i in range(n):
        for j in range(i + 1):
            exact = tri_integrate(poly_mul(modes[i], modes[j]))
            assert abs(exact - (1.0 if i == j else 0.0)) < 1e-9


def test_legendre_shifted():
    leg = legendre_shifted(4)
    s, w = gauss_interval(6)
    for m in range(5):
        for l in range(5):
            pm = np.polyval(leg[m, ::-1], s)
            pl = np.polyval(leg[l, ::-1], s)
            got = np.sum(w * pm * pl)
            exact = (1.0 / (2 * m + 1)) if m == l else 0.0
            assert abs(got - exact) < 1e-14
        # parity under s -> 1-s
        pm = np.polyval(leg[m, ::-1], s)
        pm_rev = np.polyval(leg[m, ::-1], 1.0 - s)
        assert np.allclose(pm_rev, (-1.0) ** m * pm)


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
def test_lagrange_nodal(deg):
    el = LagrangeTri(deg)
    vals = el.tabulate(el.nodes)
    assert np.allclose(vals, np.eye(el.ndofs), atol=1e-10)
    # partition of unity
    pts, _ = gauss_triangle(4)
    assert np.allclose(el.tabulate(pts).sum(axis=0), 1.0, atol=1e-10)


@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5])
def test_rt_duality(deg):
    """l_i(phi_j) = delta_ij for all functionals (reference
    test_hierarchic_rt.py:35-110 checks the same via quadrature)."""
    el = HierarchicRT(deg)
    k = deg
    assert el._dual_cond < 1e7

    # facet moments
    s, w = gauss_interval(k + 2)
    pts_e = facet_param_points(s)
    leg = legendre_shifted(k - 1)
    D = np.zeros((el.ndofs, el.ndofs))
    for e in range(3):
        tab = el.tabulate(pts_e[e])  # (ndofs, 2, nq)
        vn = REF_EDGE_ROTT[e, 0] * tab[:, 0] + REF_EDGE_ROTT[e, 1] * tab[:, 1]
        for m in range(k):
            pm = np.polyval(leg[m, ::-1], s)
            D[e * k + m] = np.sum(w * pm * vn, axis=-1)

    pts, wc = gauss_triangle(2 * k)
    div = el.tabulate_div(pts)
    dub = dubiner_basis(k - 1)
    for p in range(1, len(dub)):
        q = poly_eval(dub[p], pts)
        D[3 * k + p - 1] = np.sum(wc * q * div, axis=-1)

    row = 3 * k + el.ndofs_cell_div
    n = 0
    tab = el.tabulate(pts)
    for l in range(1, k - 1):
        for m in range(0, k - 1 - l):
            mono = pts[:, 0] ** l * pts[:, 1] ** m
            D[row + n] = np.sum(wc * mono * tab[:, 1], axis=-1)
            n += 1
    assert np.allclose(D, np.eye(el.ndofs), atol=1e-9)


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_rt_space_contains_vector_poly(deg):
    """RT_k contains P_{k-1}^2: reproduce a random P_{k-1} vector field from
    its dofs (space-equivalence check as in test_hierarchic_rt.py:117-159)."""
    rng = np.random.default_rng(42)
    el = HierarchicRT(deg)
    k = deg
    dub = dubiner_basis(k - 1)
    coef = rng.normal(size=(2, len(dub)))

    def f(pts):
        vals = np.array([poly_eval(C, pts) for C in dub])  # (ndg, npts)
        return np.einsum("am,mq->aq", coef, vals)  # (2, npts)

    # compute dofs of f
    dofs = np.zeros(el.ndofs)
    s, w = gauss_interval(k + 2)
    pts_e = facet_param_points(s)
    leg = legendre_shifted(k - 1)
    for e in range(3):
        v = f(pts_e[e])
        vn = REF_EDGE_ROTT[e, 0] * v[0] + REF_EDGE_ROTT[e, 1] * v[1]
        for m in range(k):
            pm = np.polyval(leg[m, ::-1], s)
            dofs[e * k + m] = np.sum(w * pm * vn)
    pts, wc = gauss_triangle(2 * k + 2)
    # divergence of f via exact polynomial differentiation
    from dolfinx_eqlb_tpu.elements.polynomials import poly_diff

    divC = np.zeros((k + 2, k + 2))
    for m, C in enumerate(dub):
        dX = poly_diff(C, 0) * coef[0, m]
        dY = poly_diff(C, 1) * coef[1, m]
        divC[: dX.shape[0], : dX.shape[1]] += dX
        divC[: dY.shape[0], : dY.shape[1]] += dY
    divf = poly_eval(divC, pts)
    for p in range(1, len(dub)):
        q = poly_eval(dub[p], pts)
        dofs[3 * k + p - 1] = np.sum(wc * q * divf)
    row = 3 * k + el.ndofs_cell_div
    n = 0
    vy = f(pts)[1]
    for l in range(1, k - 1):
        for m in range(0, k - 1 - l):
            dofs[row + n] = np.sum(wc * pts[:, 0] ** l * pts[:, 1] ** m * vy)
            n += 1

    # reconstruct and compare at random points
    rpts = rng.uniform(0, 0.5, size=(20, 2))
    tab = el.tabulate(rpts)
    recon = np.einsum("i,iaq->aq", dofs, tab)
    assert np.allclose(recon, f(rpts), atol=1e-9)


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
def test_rt_normal_trace_degree(deg):
    """Normal trace on each edge lies in P_{k-1}(edge) and facet dofs of one
    edge do not influence the normal trace on other edges."""
    el = HierarchicRT(deg)
    s, w = gauss_interval(deg + 3)
    pts_e = facet_param_points(s)
    leg = legendre_shifted(deg - 1)
    for e in range(3):
        tab = el.tabulate(pts_e[e])
        vn = REF_EDGE_ROTT[e, 0] * tab[:, 0] + REF_EDGE_ROTT[e, 1] * tab[:, 1]
        # cell dofs and other-edge dofs must have zero normal trace on e
        for i in range(el.ndofs):
            on_e = e * deg <= i < (e + 1) * deg
            if not on_e:
                assert np.allclose(vn[i], 0.0, atol=1e-9), (e, i)
        # trace of edge-dofs reproduces Legendre dual basis
        for m in range(deg):
            pm = np.polyval(leg[m, ::-1], s)
            # vn of dof (e, m) should have moments delta_{m, l}
            for l in range(deg):
                pl = np.polyval(leg[l, ::-1], s)
                mom = np.sum(w * pl * vn[e * deg + m])
                assert abs(mom - (1.0 if l == m else 0.0)) < 1e-9


@pytest.mark.parametrize("deg", [2, 3, 4])
def test_rt_divergence_structure(deg):
    """Divergence is controlled only by facet-0 and divergence cell dofs
    (the invariant that makes the H(div=0) space explicit, SURVEY.md 2.1):
    members with zero constant facet moments and zero div cell dofs are
    divergence free."""
    el = HierarchicRT(deg)
    pts, w = gauss_triangle(2 * deg)
    div = el.tabulate_div(pts)
    for e in range(3):
        for m in range(1, deg):  # higher facet moments
            i = e * deg + m
            # div integrates to zero against all of P_{k-1}? Not necessarily
            # zero pointwise, but zero against constants:
            assert abs(np.sum(w * div[i])) < 1e-9
    # interior dofs are divergence-free
    row = 3 * deg + el.ndofs_cell_div
    for n in range(el.ndofs_cell_int):
        assert np.allclose(div[row + n], 0.0, atol=1e-9)
