"""Semi-explicit reduced path == full KKT path, to round-off.

The two engine modes solve the same patch-wise minimisation problem through
very different algebra (explicit divergence step + reduced SPD solve vs the
full saddle-point system); on compatible data they must agree to round-off.
Compatible data: sigma in global RT_{k-1} (so vector-DG_{k-1} represents it
exactly), f = div sigma — every hat-function compatibility condition then
holds by the divergence theorem.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dolfinx_eqlb_tpu.fem.expressions as ex
from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
from dolfinx_eqlb_tpu.eqlb.patches import build_patches
from dolfinx_eqlb_tpu.fem import Function, FunctionSpace
from dolfinx_eqlb_tpu.fem.projection import local_projection
from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.mesh.generators import permute_vertices


def _compatible_data(msh, k, n_rhs, rng):
    ndg = k * (k + 1) // 2
    nc = msh.num_cells
    if k == 1:
        d_proj = np.zeros((n_rhs, nc, 2, 1))
        d_proj[..., 0] = rng.normal(size=(n_rhs, 1, 2))
        return d_proj, np.zeros((n_rhs, nc, 1))
    Vd = FunctionSpace(msh, "RT", k - 1)
    Vdg2 = FunctionSpace(msh, "DG", k - 1, vs=2)
    Vdg1 = FunctionSpace(msh, "DG", k - 1, vs=1)
    d_proj, d_rhs = [], []
    for _ in range(n_rhs):
        sig = Function(Vd, jnp.asarray(rng.normal(size=Vd.ndofs)))
        ps = local_projection(Vdg2, [sig])[0]
        pf = local_projection(Vdg1, [ex.div(sig)])[0]
        d_proj.append(np.asarray(ps.x).reshape(2, nc, ndg).transpose(1, 0, 2))
        d_rhs.append(np.asarray(pf.x).reshape(nc, ndg))
    return np.stack(d_proj), np.stack(d_rhs)


def _run_both(msh, k, weak_symmetry, rng, facet_kind=None, bvals=None):
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, build_patches(msh))
    d_proj, d_rhs = _compatible_data(msh, k, 2, rng)
    if facet_kind is None:
        facet_kind = np.zeros((2, msh.num_facets), dtype=np.int8)
        facet_kind[:, msh.boundary_facets] = 1
    if bvals is None:
        bvals = np.zeros((2, msh.num_facets, k))
    args = (jnp.asarray(d_proj), jnp.asarray(d_rhs),
            jnp.asarray(facet_kind), jnp.asarray(bvals))
    engine.mode = "kkt"
    x_kkt = engine.equilibrate(*args, weak_symmetry=weak_symmetry)
    engine.mode = "semiexplicit"
    engine._jit_eq = None
    x_se = engine.equilibrate(*args, weak_symmetry=weak_symmetry)
    scale = float(jnp.max(jnp.abs(x_kkt))) + 1e-30
    return float(jnp.max(jnp.abs(x_kkt - x_se))) / scale


@pytest.mark.parametrize("mesh_kind", ["struct", "perm"])
@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_flux_modes_agree(mesh_kind, k):
    msh = unit_square(3)
    if mesh_kind == "perm":
        msh = permute_vertices(msh, seed=3)
    rel = _run_both(msh, k, False, np.random.default_rng(k))
    assert rel < 5e-12


@pytest.mark.parametrize("k", [2, 3])
def test_weak_symmetry_modes_agree(k):
    msh = permute_vertices(unit_square(3), seed=5)
    rel = _run_both(msh, k, True, np.random.default_rng(10 + k))
    assert rel < 5e-12


@pytest.mark.parametrize("k", [1, 2, 3])
def test_flux_modes_agree_essential(k):
    """Essential (Neumann) spokes: pin boundary values of the RT_{k-1} field
    as flux BCs — exercises the pinned explicit step and the column masks."""
    msh = permute_vertices(unit_square(3), seed=8)
    rng = np.random.default_rng(20 + k)
    nf = msh.num_facets
    # compatible data with matching boundary values
    ndg = k * (k + 1) // 2
    nc = msh.num_cells
    bvals = np.zeros((2, nf, k))
    if k == 1:
        d_proj = np.zeros((2, nc, 2, 1))
        d_proj[..., 0] = rng.normal(size=(2, 1, 2))
        d_rhs = np.zeros((2, nc, 1))
        # facet-0 Legendre dofs of the constant field via RT interpolation
        # (avoids hand-rolling the rot(T) orientation convention)
        from dolfinx_eqlb_tpu.fem.interpolate import interpolate

        Vrt1 = FunctionSpace(msh, "RT", 1)
        for r in range(2):
            # physical field = dubiner-coefficient * dub_0 (= sqrt(2))
            sig = d_proj[r, 0, :, 0] * np.sqrt(2.0)
            f = interpolate(
                Vrt1, ex.expr_from_callable(
                    lambda x, s=sig: np.broadcast_to(s, x.shape[:-1] + (2,)),
                    msh, value_size=2,
                )
            )
            bvals[r, :, 0] = np.asarray(f.x)[:nf]
    else:
        Vd = FunctionSpace(msh, "RT", k - 1)
        Vdg2 = FunctionSpace(msh, "DG", k - 1, vs=2)
        Vdg1 = FunctionSpace(msh, "DG", k - 1, vs=1)
        d_proj, d_rhs = [], []
        for r in range(2):
            x = rng.normal(size=Vd.ndofs)
            sig = Function(Vd, jnp.asarray(x))
            ps = local_projection(Vdg2, [sig])[0]
            pf = local_projection(Vdg1, [ex.div(sig)])[0]
            d_proj.append(np.asarray(ps.x).reshape(2, nc, ndg).transpose(1, 0, 2))
            d_rhs.append(np.asarray(pf.x).reshape(nc, ndg))
            # the facet dofs of sigma ARE the Legendre trace moments
            bvals[r, :, : k - 1] = x[: nf * (k - 1)].reshape(nf, k - 1)
        d_proj, d_rhs = np.stack(d_proj), np.stack(d_rhs)
    facet_kind = np.zeros((2, nf), dtype=np.int8)
    facet_kind[:, msh.boundary_facets] = 2  # all flux-essential
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, build_patches(msh))
    args = (jnp.asarray(d_proj), jnp.asarray(d_rhs),
            jnp.asarray(facet_kind), jnp.asarray(np.asarray(bvals)))
    engine.mode = "kkt"
    x_kkt = engine.equilibrate(*args)
    engine.mode = "semiexplicit"
    engine._jit_eq = None
    x_se = engine.equilibrate(*args)
    scale = float(jnp.max(jnp.abs(x_kkt))) + 1e-30
    rel = float(jnp.max(jnp.abs(x_kkt - x_se))) / scale
    assert rel < 5e-12
