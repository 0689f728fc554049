"""Where does the elasticity corrector's h^1 mass live?

Computes the cellwise corrector energy int_c |delta|^2 for elasticity row 0
and for the matching scalar Poisson problem, split into cells touching the
boundary vs interior cells, over a refinement series.
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
from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

PI_1 = 1.0


def u_exact(x):
    return np.stack([
        np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
        -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])], -1)


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def cell_split(msh, dl, pts, w):
    """(sum_boundary, sum_interior) of cellwise int |dl|^2."""
    adet = np.abs(msh.detJ)
    dens = np.einsum("q,cqa,cqa,c->c", w, dl, dl, adet)
    bcells = np.zeros(msh.num_cells, bool)
    bverts = np.zeros(msh.num_vertices, bool)
    bverts[msh.facet_vertices[msh.boundary_facets].ravel()] = True
    bcells = bverts[msh.cells].any(axis=1)
    return float(dens[bcells].sum()), float(dens[~bcells].sum())


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
    eq = FluxEqlbSE(degree, msh, rhs_proj, sigma_proj)
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()

    pts, w = gauss_triangle(8)
    out = {"n": n}
    dl = np.asarray(eq.list_flux[0].evaluate(pts))
    out["el_bnd"], out["el_int"] = cell_split(msh, dl, pts, w)

    uP = PoissonSolver(FunctionSpace(msh, "P", order_prime)).solve(
        rhs_proj[0], msh.boundary_facets,
        expr_from_callable(lambda x: u_exact(x)[..., 0], msh), rtol=1e-13)
    sigP = local_projection(Vf, [-1.0 * grad(uP)])
    eqP = FluxEqlbSE(degree, msh, [rhs_proj[0]], sigP)
    eqP.set_boundary_conditions([msh.boundary_facets], [[]])
    eqP.equilibrate_fluxes()
    dlP = np.asarray(eqP.list_flux[0].evaluate(pts))
    out["po_bnd"], out["po_int"] = cell_split(msh, dlP, pts, w)
    return out


def main(ns=(4, 8, 16)):
    rows = [level(n) for n in ns]
    keys = [k for k in rows[0] if k != "n"]
    print("n    " + "".join(f"{k:>12}" for k in keys) + "   (sqrt shown)")
    for r in rows:
        print(f"{r['n']:<5}" + "".join(
            f"{np.sqrt(r[k]):>12.4e}" for k in keys))
    print("rates:")
    for i in range(1, len(rows)):
        print(f"{rows[i]['n']:<5}" + "".join(
            f"{0.5*np.log2(rows[i-1][k]/rows[i][k]):>12.2f}" for k in keys))


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (4, 8, 16))
