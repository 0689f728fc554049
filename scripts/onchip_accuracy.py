"""On-chip accuracy artifact (VERDICT round-1 item 10): run the RT2
equilibration on the real TPU in f32, pull the dof vector back, and
quantify the invariant errors in f64 against the f64 CPU solution of the
same problem.  Writes artifacts/ONCHIP_ACCURACY.json.

Usage: python scripts/onchip_accuracy.py [n]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main(n=64, k=2):
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.mesh import unit_square

    msh = unit_square(n)
    V = FunctionSpace(msh, "RT", k)
    buckets = build_patches(msh)
    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells
    # compatible data: a global RT_{k-1} field (represented exactly in the
    # projected spaces) -> every invariant must hold to round-off
    Vd = FunctionSpace(msh, "RT", k - 1)
    from dolfinx_eqlb_tpu.fem import Function, local_projection
    import dolfinx_eqlb_tpu.fem.expressions as ex

    xs = rng.normal(size=Vd.ndofs)
    sig = Function(Vd, jnp.asarray(xs))
    Vdg2 = FunctionSpace(msh, "DG", k - 1, vs=2)
    Vdg1 = FunctionSpace(msh, "DG", k - 1, vs=1)
    ps = local_projection(Vdg2, [sig])[0]
    pf = local_projection(Vdg1, [ex.div(sig)])[0]
    d_proj = np.asarray(ps.x).reshape(2, nc, ndg).transpose(1, 0, 2)[None]
    d_rhs = np.asarray(pf.x).reshape(nc, ndg)[None]
    facet_kind = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
    bvals = np.zeros((1, msh.num_facets, k))

    results = {"mesh_cells": int(nc), "flux_degree": k,
               "backend": jax.default_backend()}

    import time

    def timed_equilibrate(eng, dp, dr, reps=3):
        x = eng.equilibrate(dp, dr, facet_kind, bvals.astype(dp.dtype))
        _ = np.asarray(x[0, :4])  # readback sync (relay backend)
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            x = eng.equilibrate(dp, dr, facet_kind, bvals.astype(dp.dtype))
            _ = np.asarray(x[0, :4])
            ts.append(time.perf_counter() - t0)
        return np.asarray(x).astype(np.float64), min(ts)

    # f32 on the default backend (TPU under the driver)
    eng32 = EqlbEngine(V, buckets, dtype=jnp.float32)
    eng32.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    x32, t32 = timed_equilibrate(
        eng32, d_proj.astype(np.float32), d_rhs.astype(np.float32))
    results["f32_steady_s"] = t32

    # mixed precision: f64 tables/arithmetic, f32 Pallas factorizations with
    # one f64 refinement pass inside _dense_solve_bl ("pallas_mixed")
    xmix = tmix = None
    if jax.default_backend() == "tpu":
        jax.config.update("jax_enable_x64", True)
        engm = EqlbEngine(V, buckets, dtype=jnp.float64)
        engm.solver = "pallas_mixed"
        xmix, tmix = timed_equilibrate(
            engm, d_proj.astype(np.float64), d_rhs.astype(np.float64))
        results["mixed_steady_s"] = tmix
        results["mixed_overhead_vs_f32"] = tmix / t32

    # f64 reference in a CPU subprocess (the Pallas kernels only run in
    # interpret mode off-TPU, which requires a cpu-platform process)
    import os
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        np.savez(os.path.join(td, "in.npz"), d_proj=d_proj, d_rhs=d_rhs,
                 facet_kind=facet_kind, bvals=bvals)
        code = f"""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, {os.getcwd()!r})
from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.fem import FunctionSpace
from dolfinx_eqlb_tpu.eqlb.patches import build_patches
from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
d = np.load({td!r} + "/in.npz")
msh = unit_square({n})
V = FunctionSpace(msh, "RT", {k})
eng = EqlbEngine(V, build_patches(msh))
x = eng.equilibrate(d["d_proj"], d["d_rhs"], d["facet_kind"], d["bvals"])
np.save({td!r} + "/x64.npy", np.asarray(x))
"""
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        subprocess.run([sys.executable, "-c", code], check=True, env=env)
        x64 = np.load(os.path.join(td, "x64.npy"))

    scale = np.abs(x64).max()
    results["dof_max_abs"] = float(scale)
    results["f32_vs_f64_max_abs_dev"] = float(np.abs(x32 - x64).max())
    results["f32_vs_f64_rel_dev"] = float(np.abs(x32 - x64).max() / scale)

    # invariant errors of the f32 result, evaluated in f64
    from dolfinx_eqlb_tpu.eqlb.checks import (
        check_divergence_condition, check_jump_condition,
    )
    from dolfinx_eqlb_tpu.fem import Function as F

    runs = [("f32", x32), ("f64", x64)]
    if xmix is not None:
        results["mixed_vs_f64_max_abs_dev"] = float(np.abs(xmix - x64).max())
        runs.append(("mixed", xmix))
    for tag, x in runs:
        sigR = F(V, jnp.asarray(x[0]))
        div_err = check_divergence_condition(sigR, ps, pf, return_error=True)
        jump_ok = check_jump_condition(sigR, ps, atol=1e-4 if tag == "f32" else 1e-9)
        results[f"{tag}_divergence_max_err"] = float(
            div_err if np.isscalar(div_err) else np.max(div_err)
        )
        results[f"{tag}_jump_condition_ok"] = bool(jump_ok)

    with open("artifacts/ONCHIP_ACCURACY.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
