"""Compare the DATA residuals driving the equilibration corrector:
facet-jump term  J = sqrt(sum_F h_F ||[sig.n]||_F^2)  and volume term
R = sqrt(sum_c h_c^2 ||f - div sig||_c^2), for the elasticity row-0 data
vs the scalar Poisson data (same machinery, same mesh).

If J/R decay at h^2 for Poisson but h^1 for the elasticity row, the data
itself carries the slow rate and the equilibration is blameless; otherwise
the patch minimization is suboptimal for elasticity-row data.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.fem import (FunctionSpace, local_projection,
                                  expr_from_callable, as_vector)
from dolfinx_eqlb_tpu.models import ElasticitySolver, stress_row_expr
from dolfinx_eqlb_tpu.models import PoissonSolver
from dolfinx_eqlb_tpu.fem.expressions import grad
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle, gauss_interval

PI_1 = 1.0


def u_exact(x):
    return np.stack([
        np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
        -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])], -1)


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def facet_jump_norm(msh, sig_fn, nq=6):
    """sqrt(sum_F h_F int_F [sig.n]^2) over interior facets.  sig_fn is a
    vector-valued (vs=2) function; jumps evaluated from both sides."""
    from dolfinx_eqlb_tpu.elements.quadrature import LOCAL_EDGE_VERTICES as LOC

    t, w1 = gauss_interval(nq)
    # reference points on each local edge, parametrized by t in [0,1]
    vref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    pts_edges = []
    for e in range(3):
        a, b = LOC[e]
        pts_edges.append(vref[a][None] + t[:, None] * (vref[b] - vref[a])[None])
    # evaluate sig at all 3 edges' points in every cell
    allpts = np.concatenate(pts_edges, 0)  # (3*nq, 2)
    vals = np.asarray(sig_fn.evaluate(allpts))  # (nc, 3*nq, 2)
    vals = vals.reshape(msh.num_cells, 3, len(t), 2)

    fc, fl = msh.facet_cells, msh.facet_local
    interior = fc[:, 1] >= 0
    fi = np.where(interior)[0]
    c0, l0 = fc[fi, 0], fl[fi, 0]
    c1, l1 = fc[fi, 1], fl[fi, 1]
    v0 = vals[c0, l0]  # (nF, nq, 2)
    v1 = vals[c1, l1]
    # local edge param direction may differ between the two cells: both
    # sides traverse the edge between the same global vertices; determine
    # orientation by the global vertex ids
    gv0 = msh.cells[c0][np.arange(len(fi))[:, None],
                        np.asarray(LOC)[l0]]  # (nF, 2) global verts side 0
    gv1 = msh.cells[c1][np.arange(len(fi))[:, None], np.asarray(LOC)[l1]]
    flip = (gv0[:, 0] != gv1[:, 0])
    v1f = np.where(flip[:, None, None], v1[:, ::-1], v1)
    # facet normal and length from side-0 geometry
    p0 = msh.points[gv0[:, 0]]
    p1 = msh.points[gv0[:, 1]]
    tv = p1 - p0
    hF = np.linalg.norm(tv, axis=1)
    nrm = np.stack([tv[:, 1], -tv[:, 0]], -1) / hF[:, None]
    jmp = np.einsum("fqa,fa->fq", v0 - v1f, nrm)
    # int_F jmp^2 = hF * sum_q w1_q jmp^2
    per_f = hF * np.einsum("q,fq->f", w1, jmp**2)
    return float(np.sqrt((hF * per_f).sum()))


def level(n, degree=2, order_prime=2):
    msh = unit_square(n)
    Vf = FunctionSpace(msh, "DG", degree - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", degree - 1)
    rhs_proj = local_projection(
        Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
        quadrature_degree=2 * degree + 8)
    V = FunctionSpace(msh, "P", order_prime, vs=2)
    uh = ElasticitySolver(V, PI_1).solve(
        as_vector(rhs_proj, msh), msh.boundary_facets,
        expr_from_callable(u_exact, msh, value_size=2), rtol=1e-13)
    rows = [stress_row_expr(uh, PI_1, 0, -1.0),
            stress_row_expr(uh, PI_1, 1, -1.0)]
    sigma_proj = local_projection(Vf, rows)

    out = {"n": n}
    out["el_J0"] = facet_jump_norm(msh, sigma_proj[0])
    out["el_J1"] = facet_jump_norm(msh, sigma_proj[1])

    uP = PoissonSolver(FunctionSpace(msh, "P", order_prime)).solve(
        rhs_proj[0], msh.boundary_facets,
        expr_from_callable(lambda x: u_exact(x)[..., 0], msh), rtol=1e-13)
    sigP = local_projection(Vf, [-1.0 * grad(uP)])
    out["po_J"] = facet_jump_norm(msh, sigP[0])
    return out


def main(ns=(4, 8, 16)):
    rows = [level(n) for n in ns]
    keys = [k for k in rows[0] if k != "n"]
    print("n    " + "".join(f"{k:>12}" for k in keys))
    for r in rows:
        print(f"{r['n']:<5}" + "".join(f"{r[k]:>12.4e}" for k in keys))
    print("rates:")
    for i in range(1, len(rows)):
        print(f"{rows[i]['n']:<5}" + "".join(
            f"{np.log2(rows[i-1][k]/rows[i][k]):>12.2f}" for k in keys))


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (4, 8, 16))
