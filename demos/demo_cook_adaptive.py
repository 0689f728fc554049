"""Demo: adaptive weakly-symmetric stress equilibration on Cook's membrane.

Mirror of reference ``demo/elasticity_adaptive/demo_cook.py``: clamped left
edge, traction (0, 1/16) on the right edge, guaranteed estimator driving
Doerfler marking + bisection refinement.
"""

import os as _os
import sys as _sys

# self-locate: make `python demos/<demo>.py` work without PYTHONPATH
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dolfinx_eqlb_tpu.mesh import cook_membrane, refine_marked
from dolfinx_eqlb_tpu.fem import FunctionSpace, local_projection, expr_from_callable
from dolfinx_eqlb_tpu.models import ElasticitySolver, stress_row_expr
from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE, fluxbc
from dolfinx_eqlb_tpu.estimation import estimate_elasticity, doerfler_mark

PI_1 = 1.0
TRACTION = 1.0 / 16.0


def run(order_prime=2, degree=2, theta=0.5, max_iter=6, n0=2, verbose=True):
    from dolfinx_eqlb_tpu.eqlb.patches import refine_for_stress

    msh = cook_membrane(n0, n0)
    history = []
    for it in range(max_iter):
        # pure-traction corner patches with 2 cells cannot satisfy the
        # weak-symmetry constraints at degree 2 (the reference groups them,
        # se/reconstruction.hpp:166-234) — enlarge them by bisection
        tr_all = np.setdiff1d(
            msh.boundary_facets,
            msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0)),
        )
        msh = refine_for_stress(msh, tr_all)
        V = FunctionSpace(msh, "P", order_prime, vs=2)
        left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
        right = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 48.0))
        other = np.setdiff1d(msh.boundary_facets, np.concatenate([left, right]))

        solver = ElasticitySolver(V, PI_1)
        uh = solver.solve(
            expr_from_callable(
                lambda x: np.zeros(x.shape[:-1] + (2,)), msh, value_size=2
            ),
            left,
            expr_from_callable(
                lambda x: np.zeros(x.shape[:-1] + (2,)), msh, value_size=2
            ),
            tractions=[
                (right, lambda x: np.stack(
                    [np.zeros(x.shape[:-1]), TRACTION * np.ones(x.shape[:-1])], -1
                ))
            ],
            rtol=1e-11,
        )

        Vf = FunctionSpace(msh, "DG", degree - 1, vs=2)
        Vr = FunctionSpace(msh, "DG", degree - 1)
        sigma_proj = local_projection(
            Vf,
            [stress_row_expr(uh, PI_1, 0, -1.0), stress_row_expr(uh, PI_1, 1, -1.0)],
        )
        rhs_proj = local_projection(
            Vr, [lambda x: np.zeros(x.shape[:-1])] * 2
        )
        eq = FluxEqlbSE(degree, msh, rhs_proj, sigma_proj,
                        equilibrate_stress=True, estimate_korn_constant=True)
        # flux BCs: the equilibrated rows are -sigma rows, so sigma.n = t
        # becomes row_i . n = -t_i on traction/free boundaries; the clamped
        # (Dirichlet) edge leaves the flux free.
        bcs_row0 = [fluxbc(0.0, np.concatenate([right, other]))]
        bcs_row1 = [
            fluxbc(-TRACTION, right),
            fluxbc(0.0, other),
        ]
        eq.set_boundary_conditions([left, left], [bcs_row0, bcs_row1])
        eq.equilibrate_fluxes()

        eta, comps, cell_eta = estimate_elasticity(
            [lambda x: np.zeros(x.shape[:-1])] * 2,
            PI_1, sigma_proj, eq.list_flux, eq.get_korn_constants(),
        )
        history.append((msh.num_cells, eta))
        if verbose:
            print(f"it {it}: cells {msh.num_cells:6d}  eta {eta:.4e} "
                  f"(sig {comps[0]:.2e}, wsym {comps[1]:.2e}, osc {comps[2]:.2e})")
        if it + 1 < max_iter:
            msh = refine_marked(msh, doerfler_mark(np.asarray(cell_eta), theta))
    return history


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--max-iter", type=int, default=6)
    p.add_argument("--theta", type=float, default=0.5)
    a = p.parse_args()
    hist = run(max_iter=a.max_iter, theta=a.theta)
    h = np.array(hist)
    rate = np.polyfit(np.log(h[1:, 0]), np.log(h[1:, 1]), 1)[0]
    print(f"eta ~ ncells^{rate:.2f}")
