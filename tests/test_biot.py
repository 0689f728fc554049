"""Biot poro-elasticity (3-field u-p-pt) primal solve + simultaneous
equilibration of its three physical fields — the workload behind BASELINE
config 5 (reference ``python/test/performance/perftest_basics.py:294-382``,
testcase Biot_upp).

Invariants: the two (negated total) stress rows and the Darcy flux are
equilibrated in ONE FluxEqlbSE call (weak symmetry on the stress rows), and
each field satisfies its divergence + jump condition against the coupled
problem's physical data."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.eqlb import (
    FluxEqlbSE,
    check_divergence_condition,
    check_jump_condition,
    check_weak_symmetry_condition,
)
from dolfinx_eqlb_tpu.fem import (
    FunctionSpace,
    expr_from_callable,
    local_projection,
)
from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.mesh.generators import unit_square_unstructured
from dolfinx_eqlb_tpu.models.biot import (
    BiotSolverUPP,
    biot_fields,
    biot_bench_fields,
)


def f_body(x):
    return np.stack(
        [
            0.7 * np.sin(1.5 * np.pi * x[..., 0])
            * 1.5 * np.cos(0.7 * np.pi * x[..., 1]),
            0.7 * np.cos(1.5 * np.pi * x[..., 0])
            * 1.5 * np.sin(0.7 * np.pi * x[..., 1]),
        ],
        -1,
    )


def g_flow(x):
    return (
        1.5 * np.sin(0.7 * np.pi * x[..., 0])
        * 1.5 * np.sin(0.7 * np.pi * x[..., 1])
    )[..., None]


def _solve_biot(msh, k):
    """Primal solve with DG_{k-1}-projected data (exact hat compatibility)."""
    Vu = FunctionSpace(msh, "P", k, vs=2)
    Vp = FunctionSpace(msh, "P", k)
    Vpt = FunctionSpace(msh, "P", k - 1)
    Vdg2 = FunctionSpace(msh, "DG", k - 1, vs=2)
    Vdg1 = FunctionSpace(msh, "DG", k - 1)
    fe = local_projection(
        Vdg2, [expr_from_callable(f_body, msh, value_size=2)],
        quadrature_degree=2 * k + 6)[0]
    ge = local_projection(
        Vdg1, [expr_from_callable(g_flow, msh, value_size=1)],
        quadrature_degree=2 * k + 6)[0]
    solver = BiotSolverUPP(Vu, Vp, Vpt)
    uh, ph, pth = solver.solve(fe, ge, msh.boundary_facets, rtol=1e-13)
    return solver, uh, ph, pth, fe, ge


def test_biot_primal_residual():
    """The negated-block symmetric system reproduces the reference weak form:
    MINRES converges and the unconstrained residual rows vanish."""
    msh = unit_square(4)
    solver, uh, ph, pth, fe, ge = _solve_biot(msh, 2)
    assert solver.last_residual < 1e-10
    x = np.concatenate([np.asarray(uh.x), np.asarray(ph.x),
                        np.asarray(pth.x)])
    import jax.numpy as jnp

    r = np.asarray(solver.load_vector(fe, ge) - solver.matvec(jnp.asarray(x)))
    # pt block carries no essential dofs: its equation must hold everywhere
    npt = solver.npt
    assert np.abs(r[-npt:]).max() < 1e-9


@pytest.mark.parametrize("mesh_fn", [
    lambda: unit_square(4),
    lambda: unit_square_unstructured(5, seed=3),
])
def test_biot_three_field_equilibration(mesh_fn):
    """Divergence + jump conditions for all three physical fields and weak
    symmetry for the stress rows, from one coupled primal solve."""
    msh = mesh_fn()
    k = 2
    _, uh, ph, pth, fe, ge = _solve_biot(msh, k)
    proj_flux, rhs = biot_fields(uh, ph, pth, fe, ge, k)

    eq = FluxEqlbSE(k, msh, rhs, proj_flux, equilibrate_stress=True)
    # u and p essential on the whole boundary -> all three fluxes free there
    eq.set_boundary_conditions([msh.boundary_facets] * 3, [[], [], []])
    eq.equilibrate_fluxes()

    for i in range(3):
        err = check_divergence_condition(
            eq.list_flux[i], proj_flux[i], rhs[i], return_error=True)
        assert err < 1e-8, ("divergence", i, err)
        assert check_jump_condition(eq.list_flux[i], proj_flux[i]), \
            ("jump", i)
    assert check_weak_symmetry_condition(eq.list_flux[:2], proj_flux[:2]), \
        "weak symmetry"


def test_biot_bench_fields_shapes():
    """The bench data path: physical fields, engine-ready layouts."""
    msh = unit_square(3)
    k = 2
    d_proj, d_rhs = biot_bench_fields(msh, k)
    ndg = k * (k + 1) // 2
    assert d_proj.shape == (3, msh.num_cells, 2, ndg)
    assert d_rhs.shape == (3, msh.num_cells, ndg)
    assert np.isfinite(d_proj).all() and np.isfinite(d_rhs).all()
    assert np.abs(d_proj).max() > 1e-3  # real physics, not zeros


def test_chunked_minres_matches_unchunked():
    """Host-chunked MINRES dispatch (the relay watchdog workaround) carries
    the full Lanczos state across chunk boundaries: results are bit-exact
    against one unbounded while_loop, including mid-chunk convergence."""
    import jax.numpy as jnp

    msh = unit_square(5)
    ref_p, ref_r = biot_bench_fields(msh, 2, rtol=1e-10, maxiter=4000,
                                     dtype=jnp.float64, chunk=None)
    for chunk in (37, 4000):  # awkward boundary + converges-mid-chunk
        d_p, d_r = biot_bench_fields(msh, 2, rtol=1e-10, maxiter=4000,
                                     dtype=jnp.float64, chunk=chunk)
        assert float(jnp.max(jnp.abs(ref_p - d_p))) == 0.0, chunk
        assert float(jnp.max(jnp.abs(ref_r - d_r))) == 0.0, chunk
