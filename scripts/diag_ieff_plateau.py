"""Elasticity I_eff ~ 5.5 plateau attribution (VERDICT round-3 item 6).

The committed convergence study (ConvStudyElasticity-u_porder-2_eorder-3)
plateaus at I_eff ~ 5.5 with eta_wsym = 98% of eta.  This diagnostic
separates the two candidate causes:

  (1) KORN PESSIMISM — the bound weighs the antisymmetric corrector with
      the accumulated cell constant C_K,cell = sqrt(sum_patches 3 C_K,z^2)
      (reference ``se/reconstruction.hpp:247-260``: each cell accumulates
      (gdim+1) C_K^2 from each of its 3 vertex patches, so C_K,cell ~
      3 C_K,z even when every patch constant is sharp), vs
  (2) CORRECTOR SIZE — the weak-symmetry corrector's antisymmetric part
      ||asym Delta|| itself decaying too slowly relative to the error.

Per level it recomputes the SAME guaranteed-bound formula with
  a) the accumulated constants (committed study),
  b) the sharpest per-cell Kim constant max_z C_K,z (un-accumulated — what
     a per-patch partition-of-unity argument would give),
  c) C_K = sqrt(2) (the theoretical floor of Korn's constant for
     divergence-free fields on star-shaped domains),
  d) no Korn terms at all (eta_sig only — the corrector-size floor).

Writes artifacts/IEFF_PLATEAU.json.  Conclusion criteria: if I_eff(b)/(a)
<< 1 the plateau is Korn-accumulation pessimism; if I_eff(d) ~ 1 the
corrector itself is sharp.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.fem import (FunctionSpace, Function, local_projection,
                                  expr_from_callable, as_vector)
from dolfinx_eqlb_tpu.models import ElasticitySolver, stress_row_expr
from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE
from dolfinx_eqlb_tpu.eqlb.korn import patch_squared_korn_constants
from dolfinx_eqlb_tpu.estimation import estimate_elasticity
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle

PI_1 = 1.0


def u_exact(x):
    return np.stack([
        np.sin(np.pi * x[..., 0]) * np.cos(np.pi * x[..., 1]),
        -np.cos(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])], -1)


def f_body(x):
    return 2 * np.pi**2 * u_exact(x)


def energy_error(msh, uh):
    pts, w = gauss_triangle(12)
    xq = msh.map_points(pts)
    g = np.asarray(uh.evaluate_grad(pts))
    pi, c, s_ = np.pi, np.cos, np.sin
    gex = np.empty_like(g)
    gex[..., 0, 0] = pi * c(pi * xq[..., 0]) * c(pi * xq[..., 1])
    gex[..., 0, 1] = -pi * s_(pi * xq[..., 0]) * s_(pi * xq[..., 1])
    gex[..., 1, 0] = pi * s_(pi * xq[..., 0]) * s_(pi * xq[..., 1])
    gex[..., 1, 1] = -pi * c(pi * xq[..., 0]) * c(pi * xq[..., 1])
    de = g - gex
    eps = 0.5 * (de + np.swapaxes(de, -1, -2))
    divu = de[..., 0, 0] + de[..., 1, 1]
    dens = 2.0 * np.einsum("cqab,cqab->cq", eps, eps) + PI_1 * divu**2
    return float(np.sqrt(np.einsum("q,cq,c->", w, dens, np.abs(msh.detJ))))


def sharpest_cell_korn(msh):
    """max_z C_K,z per cell from the Kim patch constants (un-accumulated)."""
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches

    ck2 = patch_squared_korn_constants(msh)
    vmax = np.zeros(msh.num_vertices)
    buckets = build_patches(msh)
    for key, b in buckets.items():
        np.maximum.at(vmax, b.nodes, ck2[key][: b.npatches])
    cell_max = np.sqrt(vmax[msh.cells].max(axis=1))
    V0 = FunctionSpace(msh, "DG", 0)
    return Function(V0, jnp.asarray(cell_max))


def const_korn(msh, value):
    V0 = FunctionSpace(msh, "DG", 0)
    return Function(V0, jnp.full(msh.num_cells, value))


def level(n, order_prime=2, degree=3):
    msh = unit_square(n)
    Vf = FunctionSpace(msh, "DG", degree - 1, vs=2)
    Vr = FunctionSpace(msh, "DG", degree - 1)
    rhs_proj = local_projection(
        Vr, [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]],
        quadrature_degree=2 * degree + 8)
    V = FunctionSpace(msh, "P", order_prime, vs=2)
    solver = ElasticitySolver(V, PI_1)
    uh = solver.solve(as_vector(rhs_proj, msh), msh.boundary_facets,
                      expr_from_callable(u_exact, msh, value_size=2),
                      rtol=1e-12)
    rows = [stress_row_expr(uh, PI_1, 0, -1.0),
            stress_row_expr(uh, PI_1, 1, -1.0)]
    sigma_proj = local_projection(Vf, rows)
    eq = FluxEqlbSE(degree, msh, rhs_proj, sigma_proj,
                    equilibrate_stress=True, estimate_korn_constant=True)
    eq.set_boundary_conditions([msh.boundary_facets] * 2, [[], []])
    eq.equilibrate_fluxes()
    err = energy_error(msh, uh)

    f_rows = [lambda x: f_body(x)[..., 0], lambda x: f_body(x)[..., 1]]
    out = {"n": n, "energy_error": err}

    variants = {
        "accumulated": eq.get_korn_constants(),
        "kim_per_patch_max": sharpest_cell_korn(msh),
        "sqrt2_floor": const_korn(msh, np.sqrt(2.0)),
    }
    for tag, ck in variants.items():
        eta, comps, _ = estimate_elasticity(
            f_rows, PI_1, sigma_proj, eq.list_flux, ck)
        out[f"eta_{tag}"] = eta
        out[f"Ieff_{tag}"] = eta / err
        out[f"etawsym_{tag}"] = comps[1]
        ckv = np.asarray(ck.x)
        out[f"CK_{tag}_minmeanmax"] = [float(ckv.min()), float(ckv.mean()),
                                       float(ckv.max())]
    # corrector-size floor: no Korn terms at all
    eta0, comps0, _ = estimate_elasticity(
        f_rows, PI_1, sigma_proj, eq.list_flux, const_korn(msh, 0.0))
    out["eta_sig_only"] = comps0[0]
    out["Ieff_sig_only"] = comps0[0] / err

    # raw antisymmetry of the corrector (C_K-stripped): 0.5||asym Delta||
    pts, w = gauss_triangle(2 * degree + 6)
    d0 = np.asarray(eq.list_flux[0].evaluate(pts))
    d1 = np.asarray(eq.list_flux[1].evaluate(pts))
    asym = d0[..., 1] - d1[..., 0]
    nrm = float(np.sqrt(np.einsum("q,cq,c->", w, asym**2,
                                  np.abs(msh.detJ))))
    out["asym_corrector_norm"] = nrm
    out["asym_over_error"] = nrm / err
    return out


def main(ns=(8, 16, 32, 64)):
    rows = [level(n) for n in ns]
    for r in rows:
        print({k: (round(v, 5) if isinstance(v, float) else v)
               for k, v in r.items()}, flush=True)
    last = rows[-1]
    ia = last["Ieff_accumulated"]
    ik = last["Ieff_kim_per_patch_max"]
    i2 = last["Ieff_sqrt2_floor"]
    i0 = last["Ieff_sig_only"]
    if i0 < 0.35 * ia and ik < 0.6 * ia:
        verdict = (
            f"Korn-weighting pessimism, not corrector size: stripping the "
            f"Korn terms gives I_eff {i0:.2f} (the corrector itself is that "
            f"sharp), a sharp per-patch Kim constant gives {ik:.2f}, the "
            f"sqrt(2) floor gives {i2:.2f}, vs {ia:.2f} for the committed "
            f"cellwise sqrt(sum_z 3 C_K,z^2) accumulation (reference "
            f"se/reconstruction.hpp:247-260).  The accumulation is what the "
            f"guaranteed-bound proof requires, so ~{ia:.1f} is inherent to "
            f"the BOUND, not to the equilibration quality."
        )
    else:
        verdict = (
            f"corrector size contributes materially: I_eff without Korn "
            f"terms is {i0:.2f} (vs {ia:.2f} full bound, {ik:.2f} sharp "
            f"per-patch, {i2:.2f} sqrt(2) floor) — sharpening the Korn "
            f"constant alone cannot reach ~1."
        )
    concl = {
        "question": "is the committed I_eff ~ 5.5 plateau inherent?",
        "Ieff_committed_bound": ia,
        "Ieff_with_sharp_per_patch_korn": ik,
        "Ieff_with_sqrt2_korn": i2,
        "Ieff_corrector_only": i0,
        "conclusion": verdict,
    }
    data = {"levels": rows, "summary": concl}
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "IEFF_PLATEAU.json")
    with open(outp, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(concl, indent=1))


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (8, 16, 32, 64))
