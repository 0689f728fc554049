"""Intra-call overlap study for the 3-field combine (VERDICT r4 item 2).

A TPU core executes one XLA op at a time: compute ops do not run
concurrently, only DMA (HBM prefetch) overlaps compute.  So "overlap field
r's combine with field r+1's bucket solve" inside one program cannot buy
wall-clock unless the combine were DMA-shadowed under bucket compute —
which XLA's scheduler already attempts.  This script quantifies exactly
that:

  buckets3       : isolated 3-field bucket pipeline (EQLB-style segment)
  combine3       : isolated 3-field combine
  flux3          : full fused program
  overlap_ms     : buckets3 + combine3 - flux3  (DMA shadowing XLA already
                   extracts; the residual would be the most any manual
                   interleave could add)
  combine3_sol_ms: speed-of-light for the combine from its real index
                   tables at the measured cache-resident gather rate
                   (~220 M row-indices/s on v5e, PROFILE_COMBINE.json)

Writes artifacts/PROFILE_OVERLAP3.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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

    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=131072)
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    prof = {"n": n, "ncells": msh.num_cells}

    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells
    d_proj = rng.normal(size=(3, nc, 2, ndg)).astype(np.float32)
    d_rhs = rng.normal(size=(3, nc, ndg)).astype(np.float32)
    fk = jnp.asarray(np.where(msh.is_boundary_facet, 1, 0)
                     .astype(np.int8)[None].repeat(3, 0))
    bv = jnp.asarray(np.zeros((3, msh.num_facets, k), np.float32))
    dpT, drT = engine.put_transposed(d_proj, d_rhs)

    prof["flux3"] = timeit(lambda: engine.equilibrate(
        dpT, drT, fk, bv, transposed_inputs=True))
    print(f"flux3: {prof['flux3']*1000:.1f} ms", flush=True)

    engine._ensure_combine_tables(3)
    dev, refd = engine._device_tables()
    keys = sorted(engine.buckets.keys())

    def seg_solve(dprT, fk, bv, dev, refd):
        sp = jnp.moveaxis(dprT.reshape(-1, dprT.shape[-1]), 0, 1)
        sp = jnp.pad(sp, ((0, 0), (0, 128 - sp.shape[1])))
        sp = jax.lax.optimization_barrier(sp)
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                sol = se.solve_bucket_semiexplicit(
                    engine, key, dprT, fk, bv, dev[key], refd, src_packed=sp)
                outs.append(sol.ravel()[:1])
        return sum(outs)

    dprT = jnp.concatenate([dpT, drT[:, None]], axis=1)
    prof["buckets3"] = timeit(jax.jit(seg_solve), dprT, fk, bv, dev, refd)
    print(f"buckets3: {prof['buckets3']*1000:.1f} ms", flush=True)

    flat = jnp.asarray(rng.normal(size=(3, engine._flat_len))
                       .astype(np.float32))
    jc = jax.jit(lambda flat, refd: engine._combine_flat(flat, refd))
    prof["combine3"] = timeit(jc, flat, refd)
    print(f"combine3: {prof['combine3']*1000:.1f} ms", flush=True)

    prof["overlap_ms"] = round(
        (prof["buckets3"] + prof["combine3"] - prof["flux3"]) * 1e3, 2)

    # speed-of-light from the real index tables: every R-pass row index is
    # one 128-lane row fetch; the measured cache-resident rate is ~220M/s
    # (PROFILE_COMBINE.json), dropping to ~133M/s past the ~128MB cliff
    groups = engine._pack_groups(3)
    n_idx = 0
    for g in groups:
        sfx = f"R{g}" if g >= 2 else ""
        for nm in ("01", "2"):
            key_r = f"rows{nm}{sfx}"
            if key_r in refd:
                n_idx += int(np.prod(refd[key_r].shape))
    prof["pack_groups"] = groups
    prof["combine_row_indices"] = n_idx
    prof["combine3_sol_ms_cache"] = round(n_idx / 220e6 * 1e3, 1)
    prof["combine3_sol_ms_cliff"] = round(n_idx / 133e6 * 1e3, 1)
    print(f"overlap already extracted by XLA: {prof['overlap_ms']} ms; "
          f"combine SoL {prof['combine3_sol_ms_cache']}-"
          f"{prof['combine3_sol_ms_cliff']} ms from "
          f"{n_idx/1e6:.1f}M row indices", flush=True)

    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_OVERLAP3.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
