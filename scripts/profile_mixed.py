"""Per-segment profile of the mixed-precision (f64-data) path + a
double-single combine prototype (VERDICT r4 item 6).

The v5e has no native f64: gathers and einsums over f64 operands run
emulated / at doubled HBM traffic, which put the 1M-cell mixed bench at
519.9 ms vs 80.7 ms f32 (BENCH_MIXED_r04).  The candidate lever is the
error-free double-single split: represent the f64 flat solution as
(hi, lo) f32 planes through the index-rate-bound gather stages — the two
planes ride the R = 2 lane-packed paired combine (the SAME index count as
one f32 field) and the f64 value is reconstructed afterwards as
hi + lo in f64 (exact to 2^-48 relative, below the measured f64 dof
noise).

Measures at the given mesh size:
  mixed_full      : full f64 equilibrate (pallas_mixed solver)
  mixed_buckets   : isolated bucket pipeline at f64
  mixed_combine   : isolated f64 combine (batched element gathers)
  ds_combine      : hi/lo split + R=2 packed f32 combine + f64 reconstruct
  ds_combine_err  : max |ds - f64 combine| / max|f64|   (exactness check)
  f32_full        : f32 reference on the same mesh

Writes artifacts/PROFILE_MIXED.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(n=500, k=2):
    from dolfinx_eqlb_tpu.mesh import unit_square
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
    from dolfinx_eqlb_tpu.eqlb import semiexplicit as se

    t0 = time.perf_counter()
    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    on_tpu = jax.default_backend() == "tpu"
    prof = {"n": n, "ncells": msh.num_cells,
            "npatches": sum(b.npatches for b in buckets.values())}
    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells

    def make(dtype):
        d_proj = rng.normal(size=(1, nc, 2, ndg)).astype(dtype)
        d_rhs = rng.normal(size=(1, nc, ndg)).astype(dtype)
        fk = jnp.asarray(np.where(msh.is_boundary_facet, 1, 0)
                         .astype(np.int8)[None])
        bv = jnp.asarray(np.zeros((1, msh.num_facets, k), dtype))
        return d_proj, d_rhs, fk, bv

    # --- f32 reference ------------------------------------------------------
    eng32 = EqlbEngine(V, buckets, dtype=jnp.float32,
                       max_patches_per_bucket=131072)
    eng32.solver = "pallas" if on_tpu else "xla"
    d_proj, d_rhs, fk, bv = make(np.float32)
    a32 = (*eng32.put_transposed(d_proj, d_rhs), fk, bv)
    prof["f32_full"] = timeit(lambda: eng32.equilibrate(
        *a32, transposed_inputs=True))
    print(f"f32_full: {prof['f32_full']*1000:.1f} ms", flush=True)
    del eng32, a32

    # --- mixed (f64) engine -------------------------------------------------
    eng = EqlbEngine(V, buckets, dtype=jnp.float64,
                     max_patches_per_bucket=65536)
    eng.solver = "pallas_mixed" if on_tpu else "xla"
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    d_proj, d_rhs, fk, bv = make(np.float64)
    a64 = (*eng.put_transposed(d_proj, d_rhs), fk, bv)
    prof["mixed_full"] = timeit(lambda: eng.equilibrate(
        *a64, transposed_inputs=True))
    print(f"mixed_full: {prof['mixed_full']*1000:.1f} ms", flush=True)

    # isolated bucket pipeline (no combine)
    dev, refd = eng._device_tables()
    keys = sorted(eng.buckets.keys())

    def seg_solve(dprT, fk, bv, dev, refd):
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                sol = se.solve_bucket_semiexplicit(
                    eng, key, dprT, fk, bv, dev[key], refd, src_packed=None)
                outs.append(sol.ravel()[:1])
        return sum(outs)

    dprT = jnp.concatenate([a64[0], a64[1][:, None]], axis=1)
    prof["mixed_buckets"] = timeit(jax.jit(seg_solve), dprT, fk, bv, dev,
                                   refd)
    print(f"mixed_buckets: {prof['mixed_buckets']*1000:.1f} ms", flush=True)

    # isolated combine: f64 element-gather path vs the double-single path
    flat_np = rng.normal(size=(1, eng._flat_len))
    flat64 = jnp.asarray(flat_np, jnp.float64)
    os.environ["EQLB_NO_DS_COMBINE"] = "1"
    eng._ensure_combine_tables(1)  # elem tables
    _, refd = eng._device_tables()
    jc64 = jax.jit(lambda flat, refd: eng._combine_flat(flat, refd))
    prof["mixed_combine_elem"] = timeit(jc64, flat64, refd)
    print(f"mixed_combine_elem: {prof['mixed_combine_elem']*1000:.1f} ms",
          flush=True)
    x64 = jc64(flat64, refd)
    del os.environ["EQLB_NO_DS_COMBINE"]

    if eng._use_ds_combine(1):
        eng._ensure_combine_tables(1)  # R2 pair tables for the DS path
        _, refd = eng._device_tables()
        jds = jax.jit(lambda flat, refd: eng._ds_combine(flat, refd))
        prof["ds_combine"] = timeit(jds, flat64, refd)
        xds = jds(flat64, refd)
        err = float(jnp.max(jnp.abs(xds - x64))
                    / (jnp.max(jnp.abs(x64)) + 1e-300))
        prof["ds_combine_err"] = err
        print(f"ds_combine: {prof['ds_combine']*1000:.1f} ms "
              f"(rel err vs f64 elem combine {err:.2e})", flush=True)

    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_MIXED.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
