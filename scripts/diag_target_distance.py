"""Per-cell L2 distance of the hat-weighted target psi_z * sigma_proj from
the (unconstrained) cell-local RT_k space, summed over all patches/cells:

    D^2 = sum_z sum_{cells c of patch z} dist(psi_z sigma_proj|_c, RT_k(c))^2

This lower-bounds the equilibration corrector ||sigma_R - sigma_proj|| in
the engine's formulation (min ||sigma_z - psi_z sigma_proj||).  Compares
the Poisson gradient data vs the elasticity row data on the same meshes.
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
from dolfinx_eqlb_tpu.elements.rt import rt_cached
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

PI_1 = 1.0


def u_exact(x):
    return np.stack([
        np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
        -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])], -1)


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def target_distance(msh, sig_fn, k):
    """sqrt(sum_z sum_c dist^2(psi_z sig|_c, RT_k(c)))."""
    pts, w = gauss_triangle(2 * k + 4)
    nq = len(w)
    # RT_k basis on the physical cells (Piola): phi_phys = J phi_ref / detJ
    rt = rt_cached(k)
    tab = np.asarray(rt.tabulate(pts))  # (nd, 2, nq)
    J, detJ = msh.J, msh.detJ
    phi = np.einsum("cab,ibq->ciaq", J, tab) / detJ[:, None, None, None]
    sig = np.asarray(sig_fn.evaluate(pts))  # (nc, nq, 2)
    lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], -1)
    adet = np.abs(detJ)

    # per cell: gram G_ij = int phi_i.phi_j, rhs b_i = int phi_i . (lam_l sig)
    G = np.einsum("q,ciaq,cjaq,c->cij", w, phi, phi, adet)
    total = 0.0
    for l in range(3):  # the 3 patch hats alive on each cell
        tgt = sig * lam[None, :, l, None]  # (nc, nq, 2)
        b = np.einsum("q,ciaq,cqa,c->ci", w, phi, tgt, adet)
        t2 = np.einsum("q,cqa,cqa,c->c", w, tgt, tgt, adet)
        coef = np.linalg.solve(G, b[..., None])[..., 0]
        total += float((t2 - np.einsum("ci,ci->c", coef, b)).clip(0).sum())
    return float(np.sqrt(total))


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
    sp_el = local_projection(Vf, [stress_row_expr(uh, PI_1, 0, -1.0)])

    uP = PoissonSolver(FunctionSpace(msh, "P", order_prime)).solve(
        rhs_proj[0], msh.boundary_facets,
        expr_from_callable(lambda x: u_exact(x)[..., 0], msh), rtol=1e-13)
    sp_po = local_projection(Vf, [-1.0 * grad(uP)])

    return {"n": n,
            "el_dist": target_distance(msh, sp_el[0], degree),
            "po_dist": target_distance(msh, sp_po[0], degree)}


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
