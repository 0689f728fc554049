"""Per-segment steady-state profile of the stress and multi-field paths
(VERDICT r2: stress bench 468 ms vs 68 ms flux-only; 3-field 726 ms).

Times, on the live backend at the given mesh size:
  flux1         : 1-field fused equilibrate (baseline)
  flux2 / flux3 : 2- and 3-field fused equilibrate (no weak symmetry)
  stress        : 2-field fused equilibrate + weak-symmetry epilogue
  wsym_only     : isolated weak_symmetry_bucket_bl over all buckets
  combine1/3    : isolated combine at n_rhs = 1 / 3
  buckets3      : isolated bucket solves at n_rhs = 3

Writes artifacts/PROFILE_STRESS.json.
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

    def make(nf):
        d_proj = rng.normal(size=(nf, nc, 2, ndg)).astype(np.float32)
        d_rhs = rng.normal(size=(nf, nc, ndg)).astype(np.float32)
        fk = jnp.asarray(
            np.where(msh.is_boundary_facet, 1, 0)
            .astype(np.int8)[None].repeat(nf, 0))
        bv = jnp.asarray(np.zeros((nf, msh.num_facets, k), np.float32))
        dpT, drT = engine.put_transposed(d_proj, d_rhs)
        return dpT, drT, fk, bv

    args1, args2, args3 = make(1), make(2), make(3)

    for tag, a in (("flux1", args1), ("flux2", args2), ("flux3", args3)):
        prof[tag] = timeit(lambda a=a: engine.equilibrate(
            *a, transposed_inputs=True))
        print(f"{tag}: {prof[tag]*1000:.1f} ms", flush=True)

    prof["stress"] = timeit(lambda: engine.equilibrate(
        *args2, transposed_inputs=True, weak_symmetry=True))
    print(f"stress: {prof['stress']*1000:.1f} ms", flush=True)

    # isolated weak-symmetry epilogue on fixed bucket solutions
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
    fk2 = args2[2]

    def seg_wsym(sols, fk2, dev, refd):
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                d = weak_symmetry_bucket_bl(
                    engine, key, sols[key], fk2, dev[key], refd)
                outs.append(d.ravel()[:1])
        return sum(outs)

    prof["wsym_only"] = timeit(jax.jit(seg_wsym), sols, fk2, dev, refd)
    print(f"wsym_only: {prof['wsym_only']*1000:.1f} ms", flush=True)

    # isolated bucket solves at n_rhs = 3
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

    js = jax.jit(seg_solve)
    for tag, a in (("buckets1", args1), ("buckets3", args3)):
        dprT = jnp.concatenate([a[0], a[1][:, None]], axis=1)
        prof[tag] = timeit(js, dprT, a[2], a[3], dev, refd)
        print(f"{tag}: {prof[tag]*1000:.1f} ms", flush=True)

    # isolated combine at n_rhs = 1 and 3 (the engine's own path, incl. the
    # RHS-lane-packed layout for nr > 1)
    cm = engine._combine
    for nr in (1, 3):
        if nr > 1:
            engine._ensure_combine_tables(nr)
        dev, refd = engine._device_tables()
        flat_dev = jnp.asarray(
            rng.normal(size=(nr, engine._flat_len)).astype(np.float32))
        jc = jax.jit(lambda flat, refd: engine._combine_flat(flat, refd))
        prof[f"combine{nr}"] = timeit(jc, flat_dev, refd)
        print(f"combine{nr}: {prof[f'combine{nr}']*1000:.1f} ms", flush=True)

    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_STRESS.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
