"""Stage attribution of the bucket-solve cost at n_rhs = 1 vs 3.

The round-3 question: why do the bucket solves scale 6.6x when going
1 -> 3 RHS (PROFILE_STRESS.json buckets1 58 ms, buckets3 384 ms) when the
geometry work (Mc, Ainv) is cached and shared?  Times, per n_rhs:

  gather   : the per-cell dof gather g = dprT[:, cells] alone
  moments  : load_moments_bl (gather + 6-combo moment contraction)
  solve    : full solve_bucket_semiexplicit over all buckets

Writes artifacts/PROFILE_RHS_STAGES.json.
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

    t0 = time.perf_counter()
    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=131072)
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    dev, refd = engine._device_tables()
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells
    keys = sorted(engine.buckets.keys())
    prof = {"n": n, "ncells": nc}

    def make(nf):
        d_proj = rng.normal(size=(nf, nc, 2, ndg)).astype(np.float32)
        d_rhs = rng.normal(size=(nf, nc, ndg)).astype(np.float32)
        fk = jnp.asarray(
            np.where(msh.is_boundary_facet, 1, 0)
            .astype(np.int8)[None].repeat(nf, 0))
        bv = jnp.asarray(np.zeros((nf, msh.num_facets, k), np.float32))
        dpT, drT = engine.put_transposed(d_proj, d_rhs)
        return jnp.concatenate([dpT, drT[:, None]], axis=1), fk, bv

    def packed(dprT):
        sp = jnp.moveaxis(dprT.reshape(-1, dprT.shape[-1]), 0, 1)
        sp = jnp.pad(sp, ((0, 0), (0, 128 - sp.shape[1])))
        return jax.lax.optimization_barrier(sp)

    def seg_gather(dprT, dev):
        sp = packed(dprT)
        outs = []
        for key in keys:
            cb = dev[key]["cells_bl"]
            g = sp[cb.reshape(-1)]
            outs.append(g.ravel()[:1])
        return sum(outs)

    def seg_moments(dprT, dev, refd):
        sp = packed(dprT)
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                Fv, Fq = se.load_moments_bl(engine, key, dprT, dev[key],
                                            refd, src_packed=sp)
                outs.append(Fv.ravel()[:1] + Fq.ravel()[:1])
        return sum(outs)

    def seg_solve(dprT, fk, bv, dev, refd):
        sp = packed(dprT)
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                sol = se.solve_bucket_semiexplicit(
                    engine, key, dprT, fk, bv, dev[key], refd, src_packed=sp)
                outs.append(sol.ravel()[:1])
        return sum(outs)

    jg = jax.jit(seg_gather)
    jm = jax.jit(seg_moments)
    js = jax.jit(seg_solve)
    for nf in (1, 3):
        dprT, fk, bv = make(nf)
        prof[f"gather{nf}"] = timeit(jg, dprT, dev)
        print(f"gather{nf}: {prof[f'gather{nf}']*1000:.1f} ms", flush=True)
        prof[f"moments{nf}"] = timeit(jm, dprT, dev, refd)
        print(f"moments{nf}: {prof[f'moments{nf}']*1000:.1f} ms", flush=True)
        prof[f"solve{nf}"] = timeit(js, dprT, fk, bv, dev, refd)
        print(f"solve{nf}: {prof[f'solve{nf}']*1000:.1f} ms", flush=True)

    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_RHS_STAGES.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
