"""Performance-measurement harness.

Mirror of the reference's ``python/test/performance/perftest.py:26-228``:
times primal assembly+solve, projection, and SE/EV equilibration over a
series of uniformly refined meshes x flux orders, min/max over repeats,
CSV output with the same column layout spirit.
"""

from __future__ import annotations

import csv
import time

import numpy as np
import jax.numpy as jnp

from ..mesh import unit_square
from ..fem import FunctionSpace, local_projection, grad
from ..models import PoissonSolver
from ..eqlb import FluxEqlbEV, FluxEqlbSE

__all__ = ["run_perftest"]


def _timeit(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), max(ts), out


def run_perftest(
    orders=(1, 2, 3),
    nrefs=4,
    n0=10,
    repeats=3,
    out_csv="perftest.csv",
    dtype=None,
    equilibrators=("SE", "EV"),
):
    u_ext = lambda x: np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
    f_ext = lambda x: 8 * np.pi**2 * u_ext(x)

    rows = []
    for order in orders:
        for i in range(nrefs):
            n = n0 * 2**i
            msh = unit_square(n)
            V = FunctionSpace(msh, "P", order)
            Vr = FunctionSpace(msh, "DG", order - 1)
            Vf = FunctionSpace(msh, "DG", order - 1, vs=2)

            solver = PoissonSolver(V)
            rhs_proj = local_projection(Vr, [f_ext])
            t_solve_min, t_solve_max, uh = _timeit(
                lambda: solver.solve(rhs_proj[0], msh.boundary_facets, u_ext,
                                     rtol=1e-10),
                repeats,
            )
            t_proj_min, t_proj_max, sigma_proj = _timeit(
                lambda: local_projection(Vf, [-1.0 * grad(uh)]), repeats
            )

            row = {
                "order": order,
                "ncells": msh.num_cells,
                "ndofs_prime": V.ndofs,
                "t_solve_min": t_solve_min,
                "t_solve_max": t_solve_max,
                "t_proj_min": t_proj_min,
                "t_proj_max": t_proj_max,
            }
            for name in equilibrators:
                Eq = FluxEqlbSE if name == "SE" else FluxEqlbEV
                eq = Eq(order, msh, rhs_proj, sigma_proj)
                if dtype is not None:
                    eq.engine.dtype = dtype
                eq.set_boundary_conditions([msh.boundary_facets], [[]])
                eq.equilibrate_fluxes()  # warm-up/compile
                tmin, tmax, _ = _timeit(lambda: eq._solve().block_until_ready(),
                                        repeats)
                row[f"t_eqlb_{name}_min"] = tmin
                row[f"t_eqlb_{name}_max"] = tmax
            rows.append(row)
            print(", ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                            for k, v in row.items()), flush=True)

    if out_csv:
        with open(out_csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows
