"""The reference's 12 componentwise stress BC layouts
(``test_stressqlb_bcond.py:147-163``): tractions prescribed per stress ROW
on the left/bottom sides in all 12 combinations, the rest primal-Dirichlet.

Data is an exact linear symmetric stress (all projections exact at k >= 2),
so every invariant must hold to solver precision.  At degree 2 the
component-crossed corner layouts (8, 10, 12 — one row essential on one side
only, the other row on the other side only) leave a corner patch with as
many constraints as correction dofs; the reference marks the same layouts
as expected failures ("TODO - Extend patch grouping to handle these
cases"), and both-row-traction corners are handled by this framework's
patch grouping.
"""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    check_divergence_condition,
    check_jump_condition,
    check_weak_symmetry_condition,
    fluxbc,
)
from dolfinx_eqlb_tpu.fem import FunctionSpace, expr_from_callable, local_projection
from dolfinx_eqlb_tpu.mesh import unit_square

# sigma = [[x, y], [y, 2 - x]]: symmetric, linear rows, constant divergence
ROWS = (
    lambda x: np.stack([x[..., 0], x[..., 1]], -1),
    lambda x: np.stack([x[..., 1], 2.0 - x[..., 0]], -1),
)
FS = (lambda x: 2.0 * np.ones(x.shape[:-1]), lambda x: np.zeros(x.shape[:-1]))

# neumann_bcs[side][row]: sides = (left, bottom); reference id_bc 1..12
LAYOUTS = {
    1: [[True, False], [False, False]],
    2: [[False, True], [False, False]],
    3: [[False, False], [False, True]],
    4: [[False, False], [True, False]],
    5: [[True, False], [False, True]],
    6: [[True, False], [True, False]],
    7: [[False, True], [False, True]],
    8: [[False, True], [True, False]],
    9: [[True, False], [True, True]],
    10: [[False, True], [True, True]],
    11: [[True, True], [False, True]],
    12: [[True, True], [True, False]],
}
# component-crossed corners: expected failures at degree 2 (reference
# test_stressqlb_bcond.py:166 "Expected fails for degree 2: BCs 8, 10, 12")
XFAIL_DEG2 = {8, 10, 12}


@pytest.mark.parametrize("id_bc", sorted(LAYOUTS))
@pytest.mark.parametrize("deg", [2, 3, 4])
def test_stress_bc_layout(id_bc, deg):
    if deg == 2 and id_bc in XFAIL_DEG2:
        pytest.xfail("component-crossed corner (reference xfail too)")
    msh = unit_square(3)
    flags = LAYOUTS[id_bc]
    left = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 0.0))
    bot = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 0.0))
    right = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 0], 1.0))
    top = msh.locate_boundary_facets(lambda x: np.isclose(x[..., 1], 1.0))
    sides = {"left": (left, np.array([-1.0, 0.0])), "bottom": (bot, np.array([0.0, -1.0]))}

    Vr = FunctionSpace(msh, "DG", deg - 1)
    Vf = FunctionSpace(msh, "DG", deg - 1, vs=2)
    rhs = local_projection(Vr, list(FS), quadrature_degree=6)
    proj = local_projection(
        Vf,
        [expr_from_callable(r, msh, value_size=2) for r in ROWS],
        quadrature_degree=6,
    )

    prime, bcs = [], []
    for row in range(2):
        p = [right, top]
        b = []
        for si, name in enumerate(("left", "bottom")):
            fcts, n = sides[name]
            if flags[si][row]:
                b.append(fluxbc(
                    lambda x, r=row, n=n: ROWS[r](x) @ n, fcts, None
                ))
            else:
                p.append(fcts)
        prime.append(np.concatenate(p))
        bcs.append(b)

    eq = FluxEqlbSE(deg, msh, rhs, proj, equilibrate_stress=True)
    eq.set_boundary_conditions(prime, bcs)
    eq.equilibrate_fluxes()
    for i in range(2):
        assert check_divergence_condition(eq.list_flux[i], proj[i], rhs[i]), (
            "divergence", i, id_bc,
        )
        assert check_jump_condition(eq.list_flux[i], proj[i]), ("jump", i, id_bc)
    assert check_weak_symmetry_condition(eq.list_flux, proj), ("wsym", id_bc)
