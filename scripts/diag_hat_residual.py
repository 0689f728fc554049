"""Measure the interior-vertex hat compatibility residual of the elasticity
rows:  r[v, j] = int f_j hat_v dx - int sigma_proj_row_j . grad(hat_v) dx.

Exact row equilibration requires r[v, j] = 0 (Neumann compatibility of the
patch problems).  Poisson-with-FE-data satisfies it to solver tolerance;
if the elasticity rows violate it at O(h^p), the engine's mean-value
regularization absorbs the incompatibility and pollutes the corrector.
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
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

PI_1 = 1.0


def u_exact(x):
    return np.stack([
        np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
        -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])], -1)


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def hat_residual(msh, f_cells, sig_cells, pts, w):
    """r[v] = sum_cells int (f hat_v - sig . grad hat_v); f_cells (nc, nq),
    sig_cells (nc, nq, 2).  Returns (nverts,) residual and interior mask."""
    nc = msh.num_cells
    adet = np.abs(msh.detJ)  # (nc,)
    # P1 hats on the reference triangle: l0 = 1-x-y, l1 = x, l2 = y
    lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], -1)
    glam_ref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # (3, 2)
    # physical gradients: Jinv^T glam
    Jinv = np.linalg.inv(msh.J)  # (nc, 2, 2)
    glam = np.einsum("cba,lb->cla", Jinv, glam_ref)  # (nc, 3, 2)
    # div sig = f weakly on the patch: int f hat = -int sig . grad hat
    # (hat vanishes on the patch boundary), so r = int f hat + int sig.grad
    term_f = np.einsum("q,cq,ql,c->cl", w, f_cells, lam, adet)
    term_s = np.einsum("q,cqa,cla,c->cl", w, sig_cells, glam, adet)
    r = np.zeros(msh.num_vertices)
    np.add.at(r, msh.cells.ravel(), (term_f + term_s).ravel())
    interior = np.ones(msh.num_vertices, bool)
    bf = msh.facet_vertices[msh.boundary_facets]
    interior[bf.ravel()] = False
    return r, interior


def level(n, degree=2, order_prime=2):
    msh = unit_square(n)
    Vf = FunctionSpace(msh, "DG", degree - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", degree - 1)
    rhs_proj = local_projection(
        Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
        quadrature_degree=2 * degree + 8)
    V = FunctionSpace(msh, "P", order_prime, vs=2)
    solver = ElasticitySolver(V, PI_1)
    uh = solver.solve(as_vector(rhs_proj, msh), msh.boundary_facets,
                      expr_from_callable(u_exact, msh, value_size=2),
                      rtol=1e-13)
    rows = [stress_row_expr(uh, PI_1, 0, -1.0),
            stress_row_expr(uh, PI_1, 1, -1.0)]
    sigma_proj = local_projection(Vf, rows)

    pts, w = gauss_triangle(8)
    out = {"n": n}
    for j in range(2):
        fq = np.asarray(rhs_proj[j].evaluate(pts))[..., 0]
        # NOTE rows are negated stress; equilibration solves div sig = -f
        # with sig = -stress_row, so compatibility is f*hat - sig.grad(hat)
        # with sig = sigma_proj (the negated row)
        sq = np.asarray(sigma_proj[j].evaluate(pts))
        r, interior = hat_residual(msh, fq, sq, pts, w)
        out[f"row{j}_max_int"] = float(np.abs(r[interior]).max())
        out[f"row{j}_l2_int"] = float(np.sqrt((r[interior] ** 2).sum()))
    # Poisson comparison: same machinery, scalar problem
    uP = PoissonSolver(FunctionSpace(msh, "P", order_prime)).solve(
        rhs_proj[0], msh.boundary_facets,
        expr_from_callable(lambda x: u_exact(x)[..., 0], msh), rtol=1e-13)
    sigP = local_projection(FunctionSpace(msh, "DG", degree - 1, vs=2),
                            [-1.0 * grad(uP)])
    fq = np.asarray(rhs_proj[0].evaluate(pts))[..., 0]
    sq = np.asarray(sigP[0].evaluate(pts))
    r, interior = hat_residual(msh, fq, sq, pts, w)
    out["poisson_max_int"] = float(np.abs(r[interior]).max())
    return out


def main(ns=(4, 8, 16)):
    rows = [level(n) for n in ns]
    keys = [k for k in rows[0] if k != "n"]
    print("n    " + "".join(f"{k:>16}" for k in keys))
    for r in rows:
        print(f"{r['n']:<5}" + "".join(f"{r[k]:>16.3e}" for k in keys))


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (4, 8, 16))
