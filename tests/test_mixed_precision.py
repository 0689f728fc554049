"""Mixed-precision solver mode: 'pallas_mixed' factors/solves in f32 (the
TPU Pallas kernel) and applies one f64 residual-refinement pass inside
``EqlbEngine._dense_solve_bl``; the cached bucket inverses are built through
the same routine, so the steady state inherits f64-level accuracy
(on-hardware record: artifacts/ONCHIP_ACCURACY.json — divergence residual
1.05e-9 vs 1.1e-2 pure f32, dofs matching the f64 CPU reference to 5e-14,
at 1.55x the f32 steady-state cost)."""

import numpy as np
import jax.numpy as jnp

from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
from dolfinx_eqlb_tpu.eqlb.patches import build_patches
from dolfinx_eqlb_tpu.fem import FunctionSpace
from dolfinx_eqlb_tpu.mesh import unit_square


def test_pallas_mixed_matches_f64():
    msh = unit_square(5)
    V = FunctionSpace(msh, "RT", 2)
    rng = np.random.default_rng(0)
    nc, ndg = msh.num_cells, 3
    dp = rng.normal(size=(1, nc, 2, ndg))
    dr = rng.normal(size=(1, nc, ndg))
    fk = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
    bv = np.zeros((1, msh.num_facets, 2))
    xs = {}
    for sv in ("xla", "pallas_mixed"):
        eng = EqlbEngine(V, build_patches(msh), dtype=jnp.float64)
        eng.solver = sv
        xs[sv] = np.asarray(eng.equilibrate(dp, dr, fk, bv))
    dev = np.abs(xs["xla"] - xs["pallas_mixed"]).max()
    # one refinement step of the f32 factorization reaches ~f64 level on
    # these small well-conditioned patch systems
    assert dev < 1e-9, dev
