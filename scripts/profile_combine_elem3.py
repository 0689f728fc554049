"""Element-gather combine at n_rhs = 3 vs the per-field paired row-gather.

The engine routes f32-on-TPU combines through paired row gathers + the
Pallas lane select; the batched element gather (one index fetches the
column for every RHS) is reserved for f64 / off-TPU.  Round-3 measurements
suggested an element gather's cost is n_rhs-independent (~107 ms at 1M
cells) — if that holds it beats the 3 x ~42 ms per-field passes.  Writes
artifacts/PROFILE_COMBINE_ELEM3.json.
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
    np.asarray(x.ravel()[:1])


def timeit(fn, *args, repeats=5):
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

    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=131072)
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    cm = engine._combine
    _, refd = engine._device_tables()
    # force-build the elem tables (f32-on-TPU normally skips them)
    refd["elem_c0"] = jnp.asarray(cm["src01"][:, 0], jnp.int32)
    refd["elem_c1"] = jnp.asarray(cm["src01"][:, 1], jnp.int32)
    refd["elem_c2"] = jnp.asarray(cm["src2"][:, 0], jnp.int32)
    ndofs = V.ndofs
    nfk = cm["nfk"]
    Lf = engine._flat_len

    rng = np.random.default_rng(0)
    flat3 = jnp.asarray(rng.normal(size=(3, Lf)).astype(np.float32))

    def elem(f, rd):
        f = jnp.pad(f, ((0, 0), (0, cm["Lpad"] - f.shape[1])))
        gA = f[:, rd["elem_c0"]]
        gB = f[:, rd["elem_c1"]]
        g2 = f[:, rd["elem_c2"]]
        x = gA + gB
        return x.at[:, nfk:].add(g2)

    def rowg(f, rd):
        parts = [engine._combine_flat(f[r: r + 1], rd) for r in range(3)]
        return jnp.concatenate(parts, axis=0)

    je = jax.jit(elem)
    jr = jax.jit(rowg)
    xr = jr(flat3, refd)
    dev = float(jnp.max(jnp.abs(je(flat3, refd) - xr)))
    assert dev == 0.0, dev

    prof = {"n": n, "ncells": msh.num_cells,
            "elem3_ms": timeit(je, flat3, refd) * 1000,
            "elem1_ms": timeit(je, flat3[:1], refd) * 1000,
            "rowgather_3xR1_ms": timeit(jr, flat3, refd) * 1000,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0])}
    for nm in ("elem1_ms", "elem3_ms", "rowgather_3xR1_ms"):
        print(f"{nm}: {prof[nm]:.1f}", flush=True)
    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_COMBINE_ELEM3.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
