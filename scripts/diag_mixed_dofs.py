"""Where does the 1M-cell mixed-precision divergence residual come from?

Measured (BENCH_MIXED_r04): TPU pallas_mixed residual 8.5e-8 (host-f64
re-checked) vs 6.0e-9 for the pure-f64 CPU pipeline, while a second
refinement pass changes nothing and TPU f64 emulation microtests at
1e-15 relative.  This script pins the source by comparing DOFS on
identical inputs:

  stage 1 (this process, chip backend): build the bench's curl-field
    data, run the mixed engine, save inputs + dofs;
  stage 2 (subprocess, forced cpu/f64): run the f64 engine on the SAME
    saved inputs, report max |x_tpu - x_cpu| overall and split by dof
    class (facet vs cell), plus both divergence residuals.

Writes artifacts/DIAG_MIXED_DOFS.json.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_CODE = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.fem import FunctionSpace, Function
from dolfinx_eqlb_tpu.eqlb.patches import build_patches
from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
from dolfinx_eqlb_tpu.eqlb.checks import check_divergence_condition

d = np.load(sys.argv[1])
n, k = int(d["n"]), int(d["k"])
msh = unit_square(n)
buckets = build_patches(msh)
V = FunctionSpace(msh, "RT", k)
engine = EqlbEngine(V, buckets, dtype=jnp.float64,
                    max_patches_per_bucket=65536)
engine.solver = "xla"
dpT, drT = engine.put_transposed(d["dp"], d["dr"])
fk = jnp.asarray(d["fk"])
bv = jnp.asarray(d["bv"], jnp.float64)
x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True)
x_cpu = np.asarray(x[0])
x_tpu = d["x_tpu"]
nfk = msh.num_facets * k
dev = np.abs(x_tpu - x_cpu)
i = int(np.argmax(dev))
Vdg2 = FunctionSpace(msh, "DG", k - 1, vs=2)
Vdg1 = FunctionSpace(msh, "DG", k - 1, vs=1)
ps = Function(Vdg2, jnp.asarray(d["dp"][0].transpose(1, 0, 2).reshape(-1)))
pf = Function(Vdg1, jnp.asarray(d["dr"][0].reshape(-1)))
err_cpu = check_divergence_condition(
    Function(V, jnp.asarray(x_cpu)), ps, pf, return_error=True)
err_tpu = check_divergence_condition(
    Function(V, jnp.asarray(x_tpu)), ps, pf, return_error=True)
print(json.dumps({{
    "dof_max_abs_dev": float(dev.max()),
    "dof_max_abs_dev_facet": float(dev[:nfk].max()),
    "dof_max_abs_dev_cell": float(dev[nfk:].max()),
    "dof_dev_rel_to_max": float(dev.max() / np.abs(x_cpu).max()),
    "argmax_dof": i, "argmax_is_facet": bool(i < nfk),
    "n_dev_gt_1em9": int((dev > 1e-9).sum()),
    "div_err_cpu_pipeline": float(err_cpu),
    "div_err_tpu_dofs_cpu_check": float(err_tpu),
}}))
"""


def main(n=500, k=2):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dolfinx_eqlb_tpu.mesh import unit_square
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
    import bench

    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, buckets, dtype=jnp.float64,
                        max_patches_per_bucket=65536)
    engine.solver = ("pallas_mixed"
                     if jax.default_backend() == "tpu" else "xla")
    d_proj, d_rhs, fk, bv, _ = bench._make_data(
        msh, k, 1, False, False, np.float64)
    dpT, drT = engine.put_transposed(d_proj, d_rhs)
    t0 = time.perf_counter()
    x = engine.equilibrate(dpT, drT, jnp.asarray(fk),
                           jnp.asarray(bv, jnp.float64),
                           transposed_inputs=True)
    x_tpu = np.asarray(x[0])
    print(f"chip equilibrate done ({time.perf_counter()-t0:.1f}s, "
          f"backend {jax.default_backend()})", flush=True)

    path = "/tmp/diag_mixed_dofs.npz"
    np.savez(path, n=n, k=k, dp=d_proj, dr=d_rhs, fk=fk, bv=bv,
             x_tpu=x_tpu)
    out = subprocess.run(
        [sys.executable, "-c", CPU_CODE.format(repo=REPO), path],
        capture_output=True, text=True, timeout=3600)
    print(out.stderr[-2000:], file=sys.stderr, flush=True)
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["n"] = n
    res["backend_stage1"] = jax.default_backend()
    outp = os.path.join(REPO, "artifacts", "DIAG_MIXED_DOFS.json")
    with open(outp, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
