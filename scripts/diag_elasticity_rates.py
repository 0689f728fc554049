"""Diagnose the elasticity estimator's h^1 decay (VERDICT r3 follow-up).

Per refinement level, measures:
  err_proj : ||sigma_proj - sigma_exact||_L2        (expect h^2)
  corr_row : ||sigma_R - sigma_proj|| WITHOUT weak symmetry (row-wise only)
  corr_ws  : same WITH the weak-symmetry correction (this is ~eta_sig)
  asym_ws  : ||asym sigma_R|| with weak symmetry    (this is ~eta_wsym)
Splits whether the h^1 pollution enters in the row equilibration or in the
weak-symmetry correction.
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
from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

PI_1 = 1.0


def u_exact(x):
    return np.stack([
        np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
        -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])], -1)


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def sigma_exact(xq):
    # sigma = 2 eps(u) (div u = 0)
    pi = np.pi
    c, s_ = np.cos, np.sin
    g = np.empty(xq.shape[:-1] + (2, 2))
    g[..., 0, 0] = pi * c(pi * xq[..., 0]) * c(pi * xq[..., 1])
    g[..., 0, 1] = -pi * s_(pi * xq[..., 0]) * s_(pi * xq[..., 1])
    g[..., 1, 0] = pi * s_(pi * xq[..., 0]) * s_(pi * xq[..., 1])
    g[..., 1, 1] = -pi * c(pi * xq[..., 0]) * c(pi * xq[..., 1])
    return g + np.swapaxes(g, -1, -2)


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
                      rtol=1e-12)
    rows = [stress_row_expr(uh, PI_1, 0, -1.0),
            stress_row_expr(uh, PI_1, 1, -1.0)]
    sigma_proj = local_projection(Vf, rows)

    pts, w = gauss_triangle(10)
    xq = msh.map_points(pts)
    adet = np.abs(msh.detJ)
    sx = -sigma_exact(xq)  # rows are NEGATED stress

    def l2(dens):
        return float(np.sqrt(np.einsum("q,cq,c->", w, dens, adet)))

    sp = np.stack([np.asarray(s.evaluate(pts)) for s in sigma_proj], -1)
    # evaluate returns (nc, nq, vs); vs=2 per row -> (nc,nq,2rows? ) check
    # sigma_proj entries are vector-valued (vs=2) DG functions per row
    sp = np.moveaxis(sp, -1, -2)  # (nc, nq, row, comp)
    err_proj = l2(np.einsum("cqab->cq", (sp - sx) ** 2))

    out = {"n": n, "err_proj": err_proj}
    for tag, ws in (("row", False), ("ws", True)):
        eq = FluxEqlbSE(degree, msh, rhs_proj, sigma_proj,
                        equilibrate_stress=ws,
                        estimate_korn_constant=ws)
        eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
        eq.equilibrate_fluxes()
        # eq.list_flux is the CORRECTION delta_sigmaR (reference semantics:
        # sigma_R = sigma_proj + delta)
        dl = np.stack([np.asarray(f.evaluate(pts)) for f in eq.list_flux],
                      -2)  # (nc, nq, row, comp)
        sR = sp + dl
        out[f"corr_{tag}"] = l2(np.einsum("cqab->cq", dl**2))
        out[f"errR_{tag}"] = l2(np.einsum("cqab->cq", (sR - sx) ** 2))
        out[f"asym_{tag}"] = l2((dl[..., 0, 1] - dl[..., 1, 0]) ** 2)
    return out


def main(ns=(4, 8, 16, 32)):
    rows = [level(n) for n in ns]
    keys = [k for k in rows[0] if k != "n"]
    hdr = "n    " + "".join(f"{k:>12}" for k in keys)
    print(hdr)
    for r in rows:
        print(f"{r['n']:<5}" + "".join(f"{r[k]:>12.4e}" for k in keys))
    print("rates:")
    for i in range(1, len(rows)):
        print(f"{rows[i]['n']:<5}" + "".join(
            f"{np.log2(rows[i-1][k]/rows[i][k]):>12.2f}" for k in keys))


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (4, 8, 16, 32))
