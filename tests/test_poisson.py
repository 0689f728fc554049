"""Primal Poisson solver tests (manufactured solutions).

Plays the role of the primal solves in the reference demos
(``demo_reconstruction.py:256-344``, PETSc CG+BoomerAMG): the matrix-free
Jacobi-CG must reproduce polynomial solutions exactly and converge at rate
k for the trigonometric manufactured solution.
"""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, permute_vertices
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    expr_from_callable,
    cell_integrals_sq,
    grad,
)
from dolfinx_eqlb_tpu.models.poisson import PoissonSolver


@pytest.mark.parametrize("mesh_fn", [
    lambda: unit_square(4),
    lambda: permute_vertices(unit_square(4), seed=11),
])
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_poisson_polynomial_exact(mesh_fn, deg):
    """P_k solver reproduces a degree-k polynomial solution exactly."""
    msh = mesh_fn()

    def u_ext(x):
        return (x[..., 0] + 0.5 * x[..., 1]) ** deg

    def f(x):  # -laplace(u)
        if deg < 2:
            return np.zeros_like(x[..., 0])
        return -deg * (deg - 1) * (x[..., 0] + 0.5 * x[..., 1]) ** (deg - 2) * (
            1.0 + 0.25
        )

    V = FunctionSpace(msh, "P", deg)
    solver = PoissonSolver(V)
    uh = solver.solve(f, msh.boundary_facets, u_ext, rtol=1e-14)
    err = grad(uh) - expr_from_callable(
        lambda x: np.stack(
            [
                deg * (x[..., 0] + 0.5 * x[..., 1]) ** (deg - 1),
                0.5 * deg * (x[..., 0] + 0.5 * x[..., 1]) ** (deg - 1),
            ],
            axis=-1,
        ),
        msh,
        value_size=2,
    )
    e = float(cell_integrals_sq(err, 2 * deg + 2).sum())
    assert e < 1e-20, e


def test_poisson_convergence_rate():
    u = lambda x: np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
    f = lambda x: 8 * np.pi**2 * u(x)
    errs = []
    hs = []
    for n in [4, 8, 16]:
        msh = unit_square(n)
        V = FunctionSpace(msh, "P", 1)
        uh = PoissonSolver(V).solve(f, msh.boundary_facets, u, rtol=1e-12)

        def gu(x):
            return np.stack(
                [
                    2 * np.pi * np.cos(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1]),
                    -2 * np.pi * np.sin(2 * np.pi * x[..., 0]) * np.sin(2 * np.pi * x[..., 1]),
                ],
                axis=-1,
            )

        err = grad(uh) - expr_from_callable(gu, msh, value_size=2)
        errs.append(np.sqrt(float(cell_integrals_sq(err, 8).sum())))
        hs.append(1.0 / n)
    rate = np.log(errs[-2] / errs[-1]) / np.log(hs[-2] / hs[-1])
    assert rate > 0.9, (errs, rate)


def test_poisson_neumann():
    """Mixed Dirichlet/Neumann: u = x^2 + y, Dirichlet on x in {0,1},
    Neumann (grad u . n) on y in {0,1}."""
    msh = unit_square(6)
    u = lambda x: x[..., 0] ** 2 + x[..., 1]
    f = lambda x: -2.0 * np.ones_like(x[..., 0])
    V = FunctionSpace(msh, "P", 2)
    dir_facets = np.concatenate(
        [
            msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0)),
            msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 1.0)),
        ]
    )
    bottom = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 0.0))
    top = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 1.0))
    # outward normal flux grad(u).n: bottom n=(0,-1): -du/dy = -1; top: +1
    solver = PoissonSolver(V)
    uh = solver.solve(
        f,
        dir_facets,
        u,
        neumann=[
            (bottom, lambda x: -np.ones_like(x[..., 0])),
            (top, lambda x: np.ones_like(x[..., 0])),
        ],
        rtol=1e-14,
    )
    err = expr_from_callable(u, msh) - uh
    assert float(cell_integrals_sq(err, 8).sum()) < 1e-22
