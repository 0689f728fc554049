"""Per-segment steady-state profile of the 1M-cell RT2 benchmark.

Attributes the equilibrate wall-clock to its pipeline segments by timing
jitted sub-programs in isolation (VERDICT r2 item 1):

  gather+moments : dprT cell gather + 6-combo load moments (per bucket)
  particular     : explicit step (divergence dofs + ring recursion)
  resid+bz       : canonical residual + reduced RHS projection
  solve          : cached-inverse apply / boundary masked solves
  combine        : flat concat + 128-lane row gather + lane-select epilogue
  full           : the complete fused equilibrate for reference

Writes artifacts/PROFILE_STEADY.json.  Segments overlap (each includes its
upstream data dependencies' recompute unless noted), so the numbers are
upper bounds per segment; 'full' is the honest end-to-end time.
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
    print(f"mesh {time.perf_counter()-t0:.1f}s", flush=True)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    t0 = time.perf_counter()
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=65536)
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    print(f"tables {time.perf_counter()-t0:.1f}s", flush=True)

    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells
    d_proj = rng.normal(size=(1, nc, 2, ndg)).astype(np.float32)
    d_rhs = rng.normal(size=(1, nc, ndg)).astype(np.float32)
    facet_kind = np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
    bvals = np.zeros((1, msh.num_facets, k), np.float32)

    dpT, drT = engine.put_transposed(d_proj, d_rhs)
    fk = jnp.asarray(facet_kind)
    bv = jnp.asarray(bvals, jnp.float32)

    t0 = time.perf_counter()
    dev, refd = engine._device_tables()
    sync(dev)
    print(f"device tables + geom caches {time.perf_counter()-t0:.1f}s",
          flush=True)

    dprT = jnp.concatenate([dpT, drT[:, None]], axis=1)
    keys = sorted(engine.buckets.keys())
    prof = {}

    # --- full ---------------------------------------------------------------
    t0 = time.perf_counter()
    x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True)
    sync(x)
    prof["first_call_s"] = time.perf_counter() - t0
    print(f"first call {prof['first_call_s']:.1f}s", flush=True)
    prof["full"] = timeit(
        lambda: engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True)
    )

    # --- segment: element data (gather + moments) ---------------------------
    def seg_moments(dprT, fk, bv, dev, refd):
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                Mc, Fv, Fq = se.element_data_bl(
                    engine, key, dprT, dev[key], refd)
                outs.append(Fv.ravel()[:1] + Fq.ravel()[:1])
        return sum(outs)

    jm = jax.jit(seg_moments)
    prof["gather+moments"] = timeit(jm, dprT, fk, bv, dev, refd)

    # --- segment: full bucket solves (no combine) ---------------------------
    def seg_solve(dprT, fk, bv, dev, refd):
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                sol = se.solve_bucket_semiexplicit(
                    engine, key, dprT, fk, bv, dev[key], refd)
                outs.append(sol.ravel()[:1])
        return sum(outs)

    js = jax.jit(seg_solve)
    prof["buckets_total"] = timeit(js, dprT, fk, bv, dev, refd)

    # --- segment: combine only ----------------------------------------------
    n_rhs = 1
    cm = engine._combine
    flat_np = rng.normal(size=(n_rhs, cm["Lpad"])).astype(np.float32)
    flat_dev = jnp.asarray(flat_np)

    def seg_combine(flat, refd):
        from dolfinx_eqlb_tpu.ops.lane_select import lane_select_sum

        f2 = flat.reshape(n_rhs, -1, 128)

        def pick(nm):
            rows_all, lane_all = refd["rows" + nm], refd["lane" + nm]
            G, C = lane_all.shape[0], lane_all.shape[1]
            gseg = G if n_rhs * G * 1024 * C * 512 <= (6 << 30) else 1536
            segs = []
            for g0 in range(0, G, gseg):
                g1 = min(g0 + gseg, G)
                rows_flat = jax.lax.slice_in_dim(
                    rows_all, g0 * 1024 * C, g1 * 1024 * C)
                lane = jax.lax.slice_in_dim(lane_all, g0, g1)
                rg = f2[:, rows_flat].reshape(n_rhs, g1 - g0, 8, 128, C, 128)
                segs.append(jnp.stack(
                    [lane_select_sum(rg[r], lane) for r in range(n_rhs)]))
            out = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
            return out.reshape(n_rhs, -1)

        ndofs = V.ndofs
        x = pick("01")[:, :ndofs]
        tail = pick("2")[:, : ndofs - cm["nfk"]]
        return x.at[:, cm["nfk"]:].add(tail)

    jc = jax.jit(seg_combine)
    prof["combine"] = timeit(jc, flat_dev, refd)

    prof["n"] = n
    prof["ncells"] = nc
    prof["npatches"] = sum(b.npatches for b in buckets.values())
    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    for kk, vv in prof.items():
        if isinstance(vv, float):
            print(f"{kk:>18}: {vv*1000:9.2f} ms", flush=True)
        else:
            print(f"{kk:>18}: {vv}", flush=True)
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_STEADY.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    main(n=n)
