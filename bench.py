"""Headline benchmark: patches/sec equilibrated at RT2 on a 1M-cell mesh.

BASELINE.md target: equilibrate a 1M-cell triangular mesh (all patches
batched, semi-explicit strategy at RT2) in < 100 ms on a single TPU chip.
``vs_baseline`` = (0.1 s) / (measured seconds per equilibrate) — values > 1
beat the target.

Runs on whatever backend JAX selects (the driver provides the real TPU).
Compute dtype is float32: the TPU backend's batched LU is f32-only, and the
bench measures throughput, not the f64 invariant checks (tests cover those
on CPU).  All index tables enter the jitted program as device arguments.

Startup structure (the relay-attached TPU backend pays a one-off cold
start of ~100-400 s on the FIRST executable load, independent of program
size or compile caching):
  * a trivial warmup executable is launched on a background thread before
    any host precompute, so the cold start overlaps mesh + table building;
  * compiled executables persist in .jax_cache, so repeated runs on the
    same machine skip the real compiles.

Steady state is measured two ways: ``latency`` (sync after every call) and
``pipelined`` (8 calls in flight, one sync) — the latter is the headline:
repeated equilibrations (the adaptive-loop usage) never sync in between,
and the relay's ~5-30 ms dispatch+readback round trip is not device work.
"""

import json
import os
import sys
import threading
import time

import numpy as np

_t_start = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-_t_start:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _start_warmup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    def run():
        import jax.numpy as jnp

        t0 = time.perf_counter()
        out = jax.jit(lambda v: v * 2.0 + 1.0)(jnp.ones(8, jnp.float32))
        np.asarray(out)
        log(f"backend warmup done ({time.perf_counter()-t0:.1f}s)")

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return th


def main(n=500, k=2, repeats=5, n_fields=1, stress=False):
    """``n_fields > 1`` benchmarks the multi-field (poro-elasticity-style)
    configuration of BASELINE.json: several RHS equilibrated simultaneously
    through the shared patch factorizations (reference perftest_basics.py
    Biot test cases).  ``stress`` runs the weakly-symmetric stress
    configuration (BASELINE config 3: two stress rows + the patch-wise
    weak-symmetry correction)."""
    warm = _start_warmup()
    import jax
    import jax.numpy as jnp

    from dolfinx_eqlb_tpu.mesh import unit_square
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine

    t0 = time.perf_counter()
    msh = unit_square(n)  # crossed: 4 n^2 cells
    log(f"mesh: {msh.num_cells} cells, {msh.num_vertices} vertices "
        f"({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    buckets = build_patches(msh)
    npatches = sum(b.npatches for b in buckets.values())
    log(f"patches: {npatches} in {len(buckets)} buckets "
        f"({time.perf_counter()-t0:.1f}s)")

    V = FunctionSpace(msh, "RT", k)
    t0 = time.perf_counter()
    # moderate chunking balances op-count against peak HBM through the
    # combine gather's live intermediates
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=131072)
    # on-chip pivot-free factorization (ops.patch_solve): XLA's batched LU
    # makes O(D) serial HBM passes and is ~5x slower end to end
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    log(f"engine tables ({time.perf_counter()-t0:.1f}s, "
        f"solver={engine.solver})")

    ndg = k * (k + 1) // 2
    rng = np.random.default_rng(0)
    nc = msh.num_cells
    nf = max(n_fields, 2) if stress else n_fields
    d_proj = rng.normal(size=(nf, nc, 2, ndg)).astype(np.float32)
    d_rhs = rng.normal(size=(nf, nc, ndg)).astype(np.float32)
    facet_kind = (
        np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
        .repeat(nf, 0)
    )
    bvals = np.zeros((nf, msh.num_facets, k), np.float32)

    warm.join()
    # upload once in the engine's batch-last layout so the steady-state
    # timing measures device work, not per-call relay transfers
    t0 = time.perf_counter()
    dpT, drT = engine.put_transposed(d_proj, d_rhs)
    fk = jnp.asarray(facet_kind)
    bv = jnp.asarray(bvals, jnp.float32)
    log(f"data upload ({time.perf_counter()-t0:.1f}s)")

    # NOTE: block_until_ready is unreliable on the axon relay backend —
    # a small device-to-host readback is the only true synchronisation
    t0 = time.perf_counter()
    x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True,
                           weak_symmetry=stress)
    _ = np.asarray(x[0, :4])
    log(f"first call (upload + compile): {time.perf_counter()-t0:.1f}s")
    assert not bool(jnp.isnan(x[:, ::1000]).any()), "NaN in equilibrated flux"

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True,
                               weak_symmetry=stress)
        _ = np.asarray(x[0, :4])  # true sync
        times.append(time.perf_counter() - t0)
    lat = min(times)
    log(f"steady state (per-call sync): {lat*1000:.1f} ms")

    nchain = 8
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(nchain):
            x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True,
                                   weak_symmetry=stress)
        _ = np.asarray(x[0, :4])
        times.append((time.perf_counter() - t0) / nchain)
    dt = min(times)
    log(f"steady state (pipelined x{nchain}): {dt*1000:.1f} ms per "
        f"equilibrate ({npatches/dt/1e6:.2f} M patches/s)")

    field_tag = f", {n_fields} fields" if n_fields > 1 else ""
    if stress:
        field_tag = ", weakly-symmetric stress"
    print(json.dumps({
        "metric": f"RT{k} flux equilibration throughput, "
                  f"{msh.num_cells}-cell mesh, single chip, f32{field_tag}",
        "value": round(npatches / dt, 1),
        "unit": "patches/s",
        "vs_baseline": round(0.1 / dt, 3),
        "latency_ms": round(lat * 1000, 2),
    }))
    return dt


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--stress"]
    stress = "--stress" in sys.argv[1:]
    n = int(args[0]) if len(args) > 0 else 500
    n_fields = int(args[1]) if len(args) > 1 else 1
    main(n=n, n_fields=n_fields, stress=stress)
