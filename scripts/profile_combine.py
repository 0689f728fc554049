"""Attribution of the post-solve pipeline at n_rhs = 1 and 3: bucket solves
(folded-lane), the unfold transpose, and the global combine.

Writes artifacts/PROFILE_COMBINE.json.
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
    dev, refd = engine._device_tables()

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

    def pipeline(dprT, fk, bv, dev, stage):
        n_rhs = dprT.shape[0]
        ncl = dprT.shape[-1]
        w = dprT.shape[1] * dprT.shape[2] * n_rhs
        if 1 < n_rhs and w <= 128:
            sp = jnp.moveaxis(dprT.reshape(-1, ncl), 0, 1)
            sp = jnp.pad(sp, ((0, 0), (0, 128 - w)))
            sp = jax.lax.optimization_barrier(sp)
        else:
            sp = None
        flats = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                sol_bl = se.solve_bucket_semiexplicit(
                    engine, key, dprT, fk, bv, dev[key], refd, src_packed=sp)
                sol_bl = jax.lax.optimization_barrier(sol_bl)
                if engine._patch_major:
                    flats.append(
                        jnp.moveaxis(sol_bl, -1, 1).reshape(n_rhs, -1))
                else:
                    flats.append(sol_bl.reshape(n_rhs, -1))
        flat = jnp.concatenate(flats, axis=1)
        if stage == 1:  # solves + unfold + concat only; full reduction so
            return flat.sum()  # XLA cannot DCE the bucket pipelines
        if stage == 15 and n_rhs >= 2:  # + the R-pack transpose only
            R = n_rhs
            W = 128 // R
            Lpos = engine._lpad(R)
            flat = jnp.pad(flat, ((0, 0), (0, Lpos - flat.shape[1])))
            fT = jnp.moveaxis(flat, 0, 1)
            f2p = fT.reshape(-1, W * R)
            return f2p.sum()
        return engine._combine_flat(flat, refd)

    jpipe = jax.jit(pipeline, static_argnames=("stage",))
    for nf in (1, 3):
        a = make(nf)
        engine._ensure_combine_tables(nf)
        dev2, refd2 = engine._device_tables()
        stages = [(1, "solve_unfold"), (2, "full")]
        if nf >= 2:
            stages.insert(1, (15, "pack"))
        for stage, nm in stages:
            t = timeit(jpipe, a[0], a[1], a[2], dev2, stage)
            prof[f"{nm}{nf}"] = t
            print(f"{nm}{nf}: {t*1000:.1f} ms", flush=True)

    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_COMBINE.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
