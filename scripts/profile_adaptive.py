"""Adaptive-loop wall-clock profile (the reference's primary use case):
Doerfler-marked bisection refinement with flux equilibration + estimation
per iteration, timing every stage of the per-iteration rebuild:

  refine | build_patches | spaces | engine tables | upload | solve
  (first call on the new shapes = compile; .jax_cache makes repeated
  adaptive RUNS cheap, but shapes change per iteration within a run)

Writes artifacts/PROFILE_ADAPTIVE.json.  Run on TPU for the headline.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("EQLB_CPU"):  # CPU validation runs (sitecustomize pins
    jax.config.update("jax_platforms", "cpu")  # the TPU tunnel otherwise)
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main(n0=128, k=2, iters=4, theta=0.3):
    from dolfinx_eqlb_tpu.mesh import unit_square, refine_marked
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
    from dolfinx_eqlb_tpu.estimation import doerfler_mark

    msh = unit_square(n0)
    rng = np.random.default_rng(0)
    rows = []
    for it in range(iters):
        r = {"iter": it, "ncells": int(msh.num_cells)}
        t0 = time.perf_counter()
        buckets = build_patches(msh)
        r["build_patches_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        V = FunctionSpace(msh, "RT", k)
        r["space_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                            max_patches_per_bucket=131072,
                            pad_quantize=1.25)
        engine.solver = ("pallas" if jax.default_backend() == "tpu"
                         else "xla")
        r["engine_tables_s"] = time.perf_counter() - t0
        r["bucket_shapes"] = sorted(
            (int(t_["J"].shape[0]) for t_ in engine.tables.values()))

        ndg = k * (k + 1) // 2
        nc = msh.num_cells
        d_proj = rng.normal(size=(1, nc, 2, ndg)).astype(np.float32)
        d_rhs = rng.normal(size=(1, nc, ndg)).astype(np.float32)
        fk = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
        bv = np.zeros((1, msh.num_facets, k), np.float32)
        t0 = time.perf_counter()
        dpT, drT = engine.put_transposed(d_proj, d_rhs)
        fkd, bvd = jnp.asarray(fk), jnp.asarray(bv)
        r["upload_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = engine.equilibrate(dpT, drT, fkd, bvd, transposed_inputs=True)
        sync(x)
        r["first_solve_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = engine.equilibrate(dpT, drT, fkd, bvd, transposed_inputs=True)
        sync(x)
        r["steady_solve_s"] = time.perf_counter() - t0
        # unfused per-bucket dispatch: executables come from the module
        # cache, so iterations recompile only NEW bucket shapes
        t0 = time.perf_counter()
        xu = engine.equilibrate(d_proj, d_rhs, fk, bv, fuse=False)
        sync(xu)
        r["first_unfused_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        xu = engine.equilibrate(d_proj, d_rhs, fk, bv, fuse=False)
        sync(xu)
        r["steady_unfused_s"] = time.perf_counter() - t0
        dev = float(np.abs(np.asarray(x) - np.asarray(xu)).max())
        r["unfused_max_dev"] = dev
        assert dev < (1e-4 if x.dtype == jnp.float32 else 1e-10), dev
        # synthetic per-cell indicator (estimator evaluation is measured in
        # the demos; this profile isolates the rebuild machinery)
        eta = rng.random(msh.num_cells)
        t0 = time.perf_counter()
        marked = doerfler_mark(eta, theta)
        msh = refine_marked(msh, marked)
        r["mark_refine_s"] = time.perf_counter() - t0
        rows.append(r)
        print({k_: (round(v_, 3) if isinstance(v_, float) else v_)
               for k_, v_ in r.items()}, flush=True)

    out = {"config": {"n0": n0, "k": k, "theta": theta},
           "backend": jax.default_backend(), "iterations": rows}
    with open(os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "PROFILE_ADAPTIVE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
