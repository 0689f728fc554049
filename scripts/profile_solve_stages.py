"""Truncated-pipeline attribution inside solve_bucket_semiexplicit.

Times the bucket-solve pipeline cut off after each stage, at n_rhs = 1 and
3, to locate the super-linear RHS scaling (PROFILE_RHS_STAGES: solve3
286 ms vs solve1 84 ms with the gather/moments already n_rhs-flat).

  s1_moments : Mc, Fv, Fq
  s2_partic  : + boundary data + explicit particular solution sp
  s3_resid   : + canonical residual (reads Mc)
  s4_bz      : + reduced RHS Z^T resid
  s5_apply   : + cached-inverse apply y
  s6_full    : + writeback (the real solve)

Writes artifacts/PROFILE_SOLVE_STAGES.json.
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

    def solve_trunc(key, dprT, fk, bv, dv, sp_src, stage):
        # folded-lane pipeline (X = n_rhs * P, RHS-major) — mirrors
        # se.solve_bucket_semiexplicit stage by stage
        b = engine.buckets[key]
        st = engine.se_static[key]
        ns = b.nspokes
        n_rhs = dprT.shape[0]
        Mc, Fv, Fq = se.element_data_bl(engine, key, dprT, dv, refd, sp_src)
        P = Mc.shape[-1]
        if stage == 1:
            return Fv.ravel()[:1] + Fq.ravel()[:1]
        if b.is_boundary:
            ess, hatvals = se.boundary_ess_bl(engine, key, fk, bv, dv, refd)
        else:
            ess = hatvals = None
        sp = se.particular_bl(engine, key, Fq, ess, hatvals, dv)
        if stage == 2:
            return sp.ravel()[:1] + Fv.ravel()[:1]
        pidx = engine.tables[key]["patch_idx"]
        sp_can = sp[pidx]  # (n, nkeep, X)
        nkeep = Mc.shape[1]
        msp = None
        for bcol in range(nkeep):
            t = se._bx(Mc[:, :, bcol, :], n_rhs) * sp_can[:, bcol, None, :]
            msp = t if msp is None else msp + t
        resid = Fv - msp
        if stage == 3:
            return resid.ravel()[:1] + sp.ravel()[:1]
        _, bz = se.reduced_system_bl(engine, key, Mc, dv, resid=resid,
                                     matrix=False)
        if stage == 4:
            return bz.ravel()[:1] + sp.ravel()[:1]
        Dz = st["Dz"]
        if b.is_boundary:
            free = se.z_mask_x(engine, key, ess)  # (Dz, X)
            ff = free[:, None] & free[None, :]
            Az = dv["Az_bl"]
            eye = jnp.eye(Dz, dtype=engine.dtype)
            Ar = jnp.where(ff, se._bx(Az, n_rhs), 0.0) + eye[:, :, None] * (
                ~free[None])
            br = jnp.where(free, bz, 0.0)
            y = engine._dense_solve_bl(Ar, br[:, None, :])[:, 0]
        else:
            Ainv = dv["Ainv_bl"]
            y = None
            for j in range(Dz):
                t = se._bx(Ainv[:, j], n_rhs) * bz[j][None]
                y = t if y is None else y + t
        if stage == 5:
            return y.ravel()[:1] + sp.ravel()[:1]
        sol = sp
        if Dz > 1:
            sol = sol.at[st["sel"]].add(y[1:])
        sol = sol.at[0: ns * k: k].add(
            y[0][None] * se._bx(dv["cumalpha_bl"], n_rhs))
        return sol.ravel()[:1]

    def seg(dprT, fk, bv, dev, stage):
        sp = jnp.moveaxis(dprT.reshape(-1, dprT.shape[-1]), 0, 1)
        sp = jnp.pad(sp, ((0, 0), (0, 128 - sp.shape[1])))
        sp = jax.lax.optimization_barrier(sp)
        outs = []
        with jax.default_matmul_precision("float32"):
            for key in keys:
                outs.append(solve_trunc(key, dprT, fk, bv, dev[key], sp,
                                        stage))
        return sum(outs)

    jseg = jax.jit(seg, static_argnames=("stage",))
    names = {1: "moments", 2: "partic", 3: "resid", 4: "bz", 5: "apply",
             6: "full"}
    for nf in (1, 3):
        a = make(nf)
        for stage in (1, 2, 3, 4, 5, 6):
            t = timeit(jseg, a[0], a[1], a[2], dev, stage)
            prof[f"s{stage}_{names[stage]}{nf}"] = t
            print(f"s{stage}_{names[stage]}{nf}: {t*1000:.1f} ms", flush=True)

    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_SOLVE_STAGES.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
