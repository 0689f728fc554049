"""Quick stress-path timing: flux2 / stress / wsym_only only (subset of
profile_stress.py, same protocol) — for iterating on the weak-symmetry
correction without paying the full profile matrix."""

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
    from dolfinx_eqlb_tpu.eqlb.stress import weak_symmetry_bucket_bl

    t0 = time.perf_counter()
    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=131072)
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells
    prof = {"n": n, "ncells": nc,
            "npatches": sum(b.npatches for b in buckets.values())}

    d_proj = rng.normal(size=(2, nc, 2, ndg)).astype(np.float32)
    d_rhs = rng.normal(size=(2, nc, ndg)).astype(np.float32)
    fk = jnp.asarray(
        np.where(msh.is_boundary_facet, 1, 0)
        .astype(np.int8)[None].repeat(2, 0))
    bv = jnp.asarray(np.zeros((2, msh.num_facets, k), np.float32))
    dpT, drT = engine.put_transposed(d_proj, d_rhs)
    args2 = (dpT, drT, fk, bv)

    prof["flux2"] = timeit(lambda: engine.equilibrate(
        *args2, transposed_inputs=True))
    print(f"flux2: {prof['flux2']*1000:.1f} ms", flush=True)

    prof["stress"] = timeit(lambda: engine.equilibrate(
        *args2, transposed_inputs=True, weak_symmetry=True))
    print(f"stress: {prof['stress']*1000:.1f} ms", flush=True)

    engine.ensure_stress_caches()
    dev, refd = engine._device_tables()
    keys = sorted(engine.buckets.keys())
    sols = {}
    for key in keys:
        b = engine.buckets[key]
        P = dev[key]["J_bl"].shape[-1]
        nflux = (b.nspokes * k + b.ncells * engine.V.element.ndofs_cell)
        sols[key] = jnp.asarray(
            rng.normal(size=(2, nflux, P)).astype(np.float32))

    def seg_wsym(sols, fk2, dev, refd):
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                d = weak_symmetry_bucket_bl(
                    engine, key, sols[key], fk2, dev[key], refd)
                outs.append(d.ravel()[:1])
        return sum(outs)

    prof["wsym_only"] = timeit(jax.jit(seg_wsym), sols, fk, dev, refd)
    print(f"wsym_only: {prof['wsym_only']*1000:.1f} ms", flush=True)

    prof["backend"] = jax.default_backend()
    print(json.dumps(prof))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
