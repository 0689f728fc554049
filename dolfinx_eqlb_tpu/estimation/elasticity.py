"""Guaranteed error estimator for linear elasticity with weakly symmetric
equilibrated stresses (reference ``demo/elasticity/demo_error_estimation.py:60-149``).

With the corrector tensor Delta_sigma (rows = SE correctors of the negated
stress rows), Korn constants C_K and pi_1 = lambda/mu:

    eta_sig,c^2  = int_c Delta_sigma : A(Delta_sigma),
                   A(t) = 0.5 (t - pi_1/(2+2 pi_1) tr(t) I)
    eta_wsym,c   = 0.5 C_K || Delta_sigma_01 - Delta_sigma_10 ||_c
    eta_osc,c    = C_K (h_c/pi) || f + div(sigma_h + Delta_sigma) ||_c

guaranteed bound:  eta^2 = sum eta_sig^2 + sum (eta_osc + eta_wsym)^2
(+ the C_a-weighted div/pressure mismatch for the displacement-pressure
formulation, reference :113-119).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..elements.quadrature import gauss_triangle
from ..fem.expressions import as_expr
from ..fem.spaces import Function

__all__ = ["estimate_elasticity"]


def estimate_elasticity(
    f_rows,
    pi_1: float,
    sigma_proj_rows,
    corrector_rows,
    korn_constants: Function,
    quadrature_degree: int | None = None,
    guaranteed_upper_bound: bool = True,
    pressure_term=None,
):
    """Returns (eta_total, [eta_sig, eta_wsym, eta_osc], cell_eta_sq).

    ``f_rows``: exact body-force rows (with the sign convention used for the
    equilibration: div(sigma_row) = f_row); ``pressure_term``: optional
    per-cell expression ``div(u_h) - p_h / pi_1`` for the Herrmann
    formulation.
    """
    msh = korn_constants.space.mesh
    k = corrector_rows[0].space.degree
    qdeg = quadrature_degree or (2 * k + 10)
    pts, w = gauss_triangle(qdeg)
    wj = jnp.asarray(w)
    adet = jnp.abs(jnp.asarray(msh.detJ))

    # corrector tensor rows at quadrature: (nc, nq, 2) each
    d0 = corrector_rows[0].evaluate(pts)
    d1 = corrector_rows[1].evaluate(pts)
    trace = d0[..., 0] + d1[..., 1]
    c = pi_1 / (2.0 + 2.0 * pi_1)
    # Delta : A(Delta) = 0.5 (|Delta|^2 - c tr(Delta)^2)
    dd = jnp.einsum("cqa,cqa->cq", d0, d0) + jnp.einsum("cqa,cqa->cq", d1, d1)
    eta_sig2 = 0.5 * adet * jnp.einsum("q,cq->c", wj, dd - c * trace**2)

    ck = korn_constants.evaluate(pts)[..., 0]  # (nc, nq) constant per cell
    wsym = d0[..., 1] - d1[..., 0]
    eta_wsym2 = 0.25 * adet * jnp.einsum("q,cq,cq->c", wj, ck * wsym, ck * wsym)

    h = jnp.asarray(msh.h_cell)
    osc2 = jnp.zeros(msh.num_cells)
    for j in range(2):
        sig_row = as_expr(corrector_rows[j]) + as_expr(sigma_proj_rows[j])
        res = as_expr(f_rows[j], msh).evaluate(pts)[..., 0] - sig_row.evaluate_div(pts)[..., 0]
        osc2 = osc2 + adet * jnp.einsum("q,cq,cq->c", wj, ck * res, ck * res)
    eta_osc2 = (h / np.pi) ** 2 * osc2

    cell_eta_sq = eta_sig2
    if pressure_term is not None:
        ck0 = korn_constants.evaluate(pts)[:, 0, 0]
        ca2 = ((2 * pi_1) / (1 + pi_1)) * (
            1 + (pi_1 / (1 + pi_1)) * (ck0**2 - 9.0)
        )
        pv = as_expr(pressure_term).evaluate(pts)[..., 0]
        cell_eta_sq = cell_eta_sq + ca2 * adet * jnp.einsum("q,cq,cq->c", wj, pv, pv)
    if guaranteed_upper_bound:
        cell_eta_sq = cell_eta_sq + (jnp.sqrt(eta_osc2) + jnp.sqrt(eta_wsym2)) ** 2
    else:
        cell_eta_sq = cell_eta_sq + eta_osc2

    eta = float(jnp.sqrt(cell_eta_sq.sum()))
    comps = [
        float(jnp.sqrt(eta_sig2.sum())),
        float(jnp.sqrt(eta_wsym2.sum())),
        float(jnp.sqrt(eta_osc2.sum())),
    ]
    return eta, comps, cell_eta_sq
