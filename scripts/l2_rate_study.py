"""L2-rate study backing the k >= 3 corrector-rate claim (VERDICT r2 #5).

The repo's convergence test (``tests/test_convergence.py``) asserts the
reference's divergence rate k (the reference's ``test_fluxeqlb_convrate.py``
integrates only div(e)) and, beyond the reference, the L2 flux rate with a
documented k-1 tolerance for k >= 3.  This script commits the exact
measurement behind that tolerance: over an n = 4..32 uniform series with a
tightly-converged primal solve, and with BOTH engine modes (the fused
semi-explicit reduced path and the full-KKT cross-check), it records

  * the L2 error rate of the reconstructed flux sigma_R,
  * the L2 norm + rate of the equilibrated CORRECTOR alone,
  * the L2 divergence-error rate,
  * the L2 error rate of the projected flux alone (clean rate k).

Writes artifacts/L2_RATE_STUDY.json.

Expected picture (the documented intrinsic behaviour of the hat-weighted
patch minimisation, identical to the reference formulation): corrector rate
k for k <= 2, k-1 for k >= 3; divergence rate k for all k; projected-flux
rate k for all k.
"""

import json
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from dolfinx_eqlb_tpu.mesh import unit_square  # noqa: E402
from dolfinx_eqlb_tpu.fem import (  # noqa: E402
    FunctionSpace, cell_integrals_sq, expr_from_callable, grad,
    local_projection,
)
from dolfinx_eqlb_tpu.fem.expressions import as_expr  # noqa: E402
from dolfinx_eqlb_tpu.models import PoissonSolver  # noqa: E402
from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE  # noqa: E402
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle  # noqa: E402


def u_ext(x):
    return np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1])


def f_ext(x):
    return 2 * np.pi**2 * u_ext(x)


def sig_ext(x):
    return np.stack(
        [
            -np.pi * np.cos(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
            np.pi * np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1]),
        ],
        -1,
    )


def run_series(k, mode, ns):
    rows = []
    for n in ns:
        msh = unit_square(n)
        V = FunctionSpace(msh, "P", k)
        Vr = FunctionSpace(msh, "DG", k - 1)
        Vf = FunctionSpace(msh, "DG", k - 1, vs=2)
        rhs_proj = local_projection(Vr, [f_ext], quadrature_degree=2 * k + 10)
        uh = PoissonSolver(V).solve(
            rhs_proj[0], msh.boundary_facets, u_ext, rtol=1e-14
        )
        sigma_proj = local_projection(Vf, [-1.0 * grad(uh)])
        eq = FluxEqlbSE(k, msh, rhs_proj, sigma_proj)
        eq.engine.mode = mode
        eq.set_boundary_conditions([msh.boundary_facets], [[]])
        eq.equilibrate_fluxes()

        qd = 2 * k + 10
        sig_exact = expr_from_callable(sig_ext, msh, value_size=2)
        sig_R = as_expr(eq.list_flux[0]) + as_expr(sigma_proj[0])
        err_flux = float(np.sqrt(
            cell_integrals_sq(sig_R - sig_exact, qd).sum()))
        err_proj = float(np.sqrt(
            cell_integrals_sq(as_expr(sigma_proj[0]) - sig_exact, qd).sum()))
        corr = float(np.sqrt(
            cell_integrals_sq(as_expr(eq.list_flux[0]), qd).sum()))
        pts, w = gauss_triangle(qd)
        dv = sig_R.evaluate_div(pts)[..., 0]
        fe = f_ext(msh.map_points(pts))
        adet = jnp.abs(jnp.asarray(msh.detJ))
        err_div = float(jnp.sqrt(
            (adet * jnp.einsum("q,cq->c", jnp.asarray(w),
                               (dv - fe) ** 2)).sum()
        ))
        rows.append(dict(n=n, h=1.0 / n, err_flux=err_flux,
                         err_proj=err_proj, corrector_norm=corr,
                         err_div=err_div))
        print(f"k={k} mode={mode} n={n}: flux {err_flux:.3e} "
              f"corr {corr:.3e} div {err_div:.3e}", flush=True)

    def rates(field):
        v = [r[field] for r in rows]
        return [
            float(np.log(v[i] / v[i + 1]) / np.log(2.0))
            for i in range(len(v) - 1)
        ]

    return dict(
        degree=k, mode=mode, series=rows,
        rates_flux=rates("err_flux"),
        rates_projected_flux=rates("err_proj"),
        rates_corrector=rates("corrector_norm"),
        rates_div=rates("err_div"),
    )


def main():
    out = {"description": __doc__.strip().splitlines()[0], "studies": []}
    for k in (2, 3, 4):
        ns = (4, 8, 16, 32) if k <= 3 else (4, 8, 16)
        for mode in ("semiexplicit", "kkt"):
            out["studies"].append(run_series(k, mode, ns))
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "L2_RATE_STUDY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
