"""Headline benchmark: patches/sec equilibrated at RT2 on a 1M-cell mesh.

BASELINE.md target: equilibrate a 1M-cell triangular mesh (all patches
batched, semi-explicit strategy at RT2) in < 100 ms on a single TPU chip.
``vs_baseline`` = (0.1 s) / (measured seconds per equilibrate) — values > 1
beat the target.

Runs on whatever backend JAX selects (the driver provides the real TPU).
Compute dtype is float32 by default: the TPU backend's batched LU is
f32-only, and the bench measures throughput (tests cover the f64 invariants
on CPU).  ``--mixed`` switches to float64 data with the mixed-precision
Pallas solver (f32 factorization + one f64 refinement pass) and reports the
on-chip divergence residual alongside the latency — the accuracy-grade
configuration.  All index tables enter the jitted program as device
arguments.

Robustness (the driver must ALWAYS get a JSON line on stdout):
  * backend init + first-executable warmup run under a bounded deadline on
    a daemon thread; on timeout or repeated init errors the bench prints a
    structured ``{"error": ...}`` JSON and exits instead of blocking inside
    backend init (round-3 failure mode: 27 min hang, rc 124, no output);
  * the strict per-call latency JSON line is printed BEFORE the pipelined
    loop, so even a mid-run kill captures the primary metric;
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


def emit(payload):
    print(json.dumps(payload), flush=True)


def fail(stage, detail, metric="RT2 flux equilibration throughput"):
    """Structured failure: one parseable JSON line on stdout, then exit.
    vs_baseline 0.0 marks the run red without requiring the driver to
    special-case a non-JSON traceback."""
    log(f"FAILED at {stage}: {detail}")
    emit({
        "metric": metric,
        "value": 0.0,
        "unit": "patches/s",
        "vs_baseline": 0.0,
        "error": f"{stage}: {detail}",
    })
    # flush + hard exit: a hung backend-init thread cannot block shutdown
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(3)


def probe_backend(deadline_s=150.0, retries=2):
    """Bounded backend init: resolve jax.devices() on a daemon thread with
    a deadline (the relay backend has blocked ~27 min inside init when its
    TPU claim was held elsewhere — round-3 BENCH failure).  Returns the
    backend platform name or calls fail()."""
    result = {}

    def init():
        try:
            import jax

            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache"),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
            result["devices"] = jax.devices()
            result["backend"] = jax.default_backend()
        except Exception as e:  # noqa: BLE001 — reported structurally
            result["error"] = f"{type(e).__name__}: {e}"

    for attempt in range(retries + 1):
        result.clear()
        th = threading.Thread(target=init, daemon=True)
        t0 = time.perf_counter()
        th.start()
        th.join(deadline_s)
        if th.is_alive():
            fail("backend-init",
                 f"no response within {deadline_s:.0f}s "
                 f"(attempt {attempt + 1}/{retries + 1}; the TPU claim is "
                 "likely held by another process or the relay is down)")
        if "error" not in result:
            log(f"backend: {result['backend']} {result['devices']} "
                f"({time.perf_counter()-t0:.1f}s)")
            return result["backend"]
        log(f"backend init error (attempt {attempt + 1}): {result['error']}")
        if attempt < retries:
            time.sleep(10.0)
    fail("backend-init", result.get("error", "unknown"))


def start_warmup(deadline_s=420.0):
    """Launch a trivial executable on a background thread so the relay
    backend's one-off cold start (~100-400 s historically) overlaps host
    precompute.  Returns a join(deadline) callable that fail()s on timeout."""
    done = {}

    def run():
        try:
            import jax
            import jax.numpy as jnp

            t0 = time.perf_counter()
            out = jax.jit(lambda v: v * 2.0 + 1.0)(jnp.ones(8, jnp.float32))
            np.asarray(out)
            log(f"backend warmup done ({time.perf_counter()-t0:.1f}s)")
            done["ok"] = True
        except Exception as e:  # noqa: BLE001 — reported structurally
            done["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=run, daemon=True)
    th.start()

    def join():
        th.join(deadline_s)
        if th.is_alive():
            fail("warmup", f"first executable did not launch within "
                 f"{deadline_s:.0f}s")
        if "error" in done:
            fail("warmup", done["error"])

    return join


def _make_data(msh, k, n_fields, stress, biot, dtype, mg_meshes=None):
    """Per-cell dof data for the bench.  ``biot`` replaces the random
    multi-field data with the three physical fields of a poro-elasticity
    primal solve (BASELINE config 5 made honest — reference
    perftest_basics.py:294-360): two stress rows + the Darcy flux.
    ``mg_meshes`` (the bench mesh's red-refinement hierarchy) switches the
    solve to block-multigrid MINRES: mesh-independent iteration counts at
    rtol 1e-6 even in f32, where Jacobi needed 20k+ iterations."""
    ndg = k * (k + 1) // 2
    nc = msh.num_cells
    nf = max(n_fields, 2) if stress else n_fields
    if biot:
        from dolfinx_eqlb_tpu.models.biot import biot_bench_fields

        # f32 compute caps the attainable MINRES residual; the bench only
        # needs physically coupled fields, not f64-grade dofs (the
        # equilibration invariants and its timing are data-independent).
        # chunk bounds each device dispatch (the relay watchdog killed the
        # worker mid MINRES with 50 s dispatches at 6.5M dofs); with the
        # V-cycle each iteration is ~10 matvec-equivalents, so chunk drops
        rtol = 1e-10 if dtype == np.float64 else (
            1e-6 if mg_meshes is not None else 1e-4)
        t0 = time.perf_counter()
        import jax.numpy as _jnp

        sdt = _jnp.float64 if dtype == np.float64 else _jnp.float32
        d_proj, d_rhs = biot_bench_fields(
            msh, k, rtol=rtol, dtype=sdt,
            chunk=25 if mg_meshes is not None else 100,
            maxiter=(20000 if dtype == np.float64 else
                     (400 if mg_meshes is not None else 1000)),
            mg_meshes=mg_meshes)
        nf = d_proj.shape[0]
        log(f"biot primal fields: {nf} fields from the coupled solve "
            f"({time.perf_counter()-t0:.1f}s)")
    elif dtype == np.float64:
        # accuracy-grade (--mixed) run: the divergence invariant is NOT
        # data-independent — the semi-explicit step needs the hat-function
        # compatibility sum_patch(hat_i f - grad hat_i . sigma_proj) = 0,
        # which Galerkin solutions satisfy by construction and raw random
        # dofs do not (measured: 144 residual at 4k cells).  Random data
        # that IS exactly compatible: sigma_proj = curl z for a random C0
        # P_k function z (discretely divergence-free against every hat),
        # f = 0.  Dense dofs, identical op counts — timing is unaffected.
        import jax.numpy as _jnp

        from dolfinx_eqlb_tpu.eqlb.equilibrators import _dg_dofs
        from dolfinx_eqlb_tpu.fem import (
            Function, FunctionSpace, grad, local_projection,
        )

        t0 = time.perf_counter()
        rng = np.random.default_rng(0)
        Vp = FunctionSpace(msh, "P", k)
        Vf = FunctionSpace(msh, "DG", k - 1, vs=2)
        rows = []
        # one-off data prep on the CPU backend: the projection's tiny-dim
        # einsums tile-pad to 7.6 GB at 1M cells on the TPU
        import jax as _jax

        with _jax.default_device(_jax.devices("cpu")[0]):
            for r in range(nf):
                z = Function(Vp, _jnp.asarray(rng.normal(size=Vp.ndofs)))
                d = _dg_dofs(local_projection(Vf, [grad(z)])[0], ndg)
                rows.append(np.stack([d[:, 1], -d[:, 0]], axis=1))
        d_proj = np.stack(rows)
        d_rhs = np.zeros((nf, nc, ndg))
        log(f"compatible curl-field data ({time.perf_counter()-t0:.1f}s)")
    else:
        rng = np.random.default_rng(0)
        d_proj = rng.normal(size=(nf, nc, 2, ndg))
        d_rhs = rng.normal(size=(nf, nc, ndg))
    facet_kind = (
        np.where(msh.is_boundary_facet, 1, 0).astype(np.int8)[None]
        .repeat(nf, 0)
    )
    bvals = np.zeros((nf, msh.num_facets, k))
    return (d_proj.astype(dtype), d_rhs.astype(dtype), facet_kind,
            bvals.astype(dtype), nf)


def _host_divergence_check(n, k, x, d_proj0, d_rhs0):
    """Re-verify the divergence residual of downloaded dofs in TRUE IEEE
    f64 on the host CPU.  This process's backend is pinned to the chip
    (the container sitecustomize maps the cpu platform away), so the check
    runs in a subprocess that forces jax_platforms=cpu.  Returns
    ``(err, scale)`` — the max residual and the inverse-estimate magnitude
    of the field (max|sigma_R| / h_min) — or None when the subprocess
    fails (diagnostic only).

    Why the scale matters: with curl-field data (f = 0) the checker's max
    |div sigma_R - Pi f| is a pure cancellation residual whose terms carry
    the divergence-operator amplification 1/detJ ~ 2 n^2 (~5e5 at n=500).
    ``artifacts/DIAG_MIXED_DOFS.json`` shows the mixed-precision dofs match
    a pure-f64 CPU equilibration of identical inputs to 2.3e-13, yet that
    dof-level noise alone puts the ABSOLUTE residual at ~1e-7 on a 1M-cell
    mesh — any f64 implementation differing only in summation order lands
    there (the all-f64 CPU pipeline itself measures 6.0e-9 only because its
    reduction order happens to match the checker's).  ``err / scale`` is the
    mesh-size-comparable accuracy number."""
    import subprocess
    import tempfile

    code = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from dolfinx_eqlb_tpu.mesh import unit_square
from dolfinx_eqlb_tpu.fem import FunctionSpace, Function
from dolfinx_eqlb_tpu.eqlb.checks import check_divergence_condition
d = np.load(sys.argv[1])
msh = unit_square({n})
V = FunctionSpace(msh, "RT", {k})
Vdg2 = FunctionSpace(msh, "DG", {k} - 1, vs=2)
Vdg1 = FunctionSpace(msh, "DG", {k} - 1, vs=1)
sig = Function(V, jnp.asarray(d["x"], jnp.float64))
ps = Function(Vdg2, jnp.asarray(d["dp"].transpose(1, 0, 2).reshape(-1)))
pf = Function(Vdg1, jnp.asarray(d["dr"].reshape(-1)))
err = check_divergence_condition(sig, ps, pf, return_error=True)
# inverse-estimate field magnitude: |div sigma| <~ |sigma| / h, so the
# residual is reported relative to max|sigma_R| / h_min as well
from dolfinx_eqlb_tpu.eqlb.checks import reconstructed_flux_expr
from dolfinx_eqlb_tpu.elements.quadrature import gauss_triangle
pts, _ = gauss_triangle(2 * {k} + 2)
vmax = float(jnp.max(jnp.abs(reconstructed_flux_expr(sig, ps).evaluate(pts))))
h_min = float(np.sqrt(2.0 * np.min(np.abs(np.asarray(msh.detJ)))))
print(json.dumps({{"err": float(err), "scale": vmax / h_min}}))
"""
    try:
        with tempfile.NamedTemporaryFile(suffix=".npz") as f:
            np.savez(f.name, x=x, dp=d_proj0, dr=d_rhs0)
            repo = os.path.dirname(os.path.abspath(__file__))
            out = subprocess.run(
                [sys.executable, "-c",
                 code.format(repo=repo, n=n, k=k), f.name],
                capture_output=True, text=True, timeout=1200)
        res = json.loads(out.stdout.strip().splitlines()[-1])
        return float(res["err"]), float(res["scale"])
    except Exception as e:  # noqa: BLE001 — diagnostic only
        log(f"host f64 re-check unavailable: {type(e).__name__}: {e}")
        return None


def main(n=500, k=2, repeats=5, n_fields=1, stress=False, mixed=False,
         biot=False):
    """``n_fields > 1`` benchmarks the multi-field (poro-elasticity-style)
    configuration of BASELINE.json: several RHS equilibrated simultaneously
    through the shared patch factorizations (reference perftest_basics.py
    Biot test cases).  ``stress`` runs the weakly-symmetric stress
    configuration (BASELINE config 3).  ``mixed`` runs float64 data through
    the mixed-precision Pallas solver and reports the divergence residual
    (accuracy-grade flagship).  ``biot`` feeds the multi-field run with the
    three physical fields of a Biot poro-elasticity solve."""
    backend = probe_backend()
    warm = start_warmup()
    import jax
    import jax.numpy as jnp

    if mixed:
        jax.config.update("jax_enable_x64", True)

    from dolfinx_eqlb_tpu.mesh import unit_square
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine

    t0 = time.perf_counter()
    mg_meshes = None
    if biot:
        # the Biot primal solve rides a block-geometric-multigrid MINRES,
        # which needs a nested mesh hierarchy: the bench mesh becomes the
        # red-refinement of a crossed base (same dof structure per cell;
        # n is rounded to the nearest power-of-two multiple of 16 —
        # n=500 -> 512, i.e. 1,048,576 cells, ~4.9% above 4n^2)
        from dolfinx_eqlb_tpu.fem.multigrid import mesh_hierarchy

        nlevels = max(1, round(np.log2(max(n, 16) / 16))) + 1
        mg_meshes = mesh_hierarchy(unit_square(16), nlevels)
        msh = mg_meshes[-1]
    else:
        msh = unit_square(n)  # crossed: 4 n^2 cells
    log(f"mesh: {msh.num_cells} cells, {msh.num_vertices} vertices "
        f"({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    buckets = build_patches(msh)
    npatches = sum(b.npatches for b in buckets.values())
    log(f"patches: {npatches} in {len(buckets)} buckets "
        f"({time.perf_counter()-t0:.1f}s)")

    dtype = jnp.float64 if mixed else jnp.float32
    V = FunctionSpace(msh, "RT", k)

    # data prep BEFORE the engine tables are uploaded: the Biot prep runs a
    # block-MG MINRES on the device, and its operator hierarchy must not
    # coexist with the multi-GB equilibration tables on the 16 GB worker
    # (r05: the worker crashed mid-solve with the engine resident)
    np_dt = np.float64 if mixed else np.float32
    warm()
    if biot and os.environ.get("EQLB_BIOT_PREP_CPU"):
        # escape hatch: home the whole primal prep (MG MINRES included) on
        # the host if the device worker cannot take the solve
        with jax.default_device(jax.devices("cpu")[0]):
            d_proj, d_rhs, facet_kind, bvals, nf = _make_data(
                msh, k, n_fields, stress, biot, np_dt, mg_meshes=mg_meshes)
    else:
        d_proj, d_rhs, facet_kind, bvals, nf = _make_data(
            msh, k, n_fields, stress, biot, np_dt, mg_meshes=mg_meshes)

    t0 = time.perf_counter()
    # moderate chunking balances op-count against peak HBM through the
    # combine gather's live intermediates; f64 (--mixed) doubles every live
    # buffer, so it defaults to half the chunk (131072 crashed the 16 GB
    # worker at 1M cells)
    chunk = int(os.environ.get(
        "EQLB_BENCH_CHUNK", 65536 if mixed else 131072))
    engine = EqlbEngine(V, buckets, dtype=dtype,
                        max_patches_per_bucket=chunk)
    # on-chip pivot-free factorization (ops.patch_solve): XLA's batched LU
    # makes O(D) serial HBM passes and is ~5x slower end to end
    if mixed:
        engine.solver = "pallas_mixed" if backend == "tpu" else "xla"
    else:
        engine.solver = "pallas" if backend == "tpu" else "xla"
    log(f"engine tables ({time.perf_counter()-t0:.1f}s, "
        f"solver={engine.solver})")
    # upload once in the engine's batch-last layout so the steady-state
    # timing measures device work, not per-call relay transfers
    t0 = time.perf_counter()
    dpT, drT = engine.put_transposed(d_proj, d_rhs)
    fk = jnp.asarray(facet_kind)
    bv = jnp.asarray(bvals, dtype)
    log(f"data upload ({time.perf_counter()-t0:.1f}s)")

    # NOTE: block_until_ready is unreliable on the axon relay backend —
    # a small device-to-host readback is the only true synchronisation
    t0 = time.perf_counter()
    x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True,
                           weak_symmetry=stress)
    _ = np.asarray(x[0, :4])
    log(f"first call (upload + compile): {time.perf_counter()-t0:.1f}s")
    assert not bool(jnp.isnan(x[:, ::1000]).any()), "NaN in equilibrated flux"

    # two more untimed calls: the relay's dispatch path (executable cache,
    # transfer plumbing) settles over the first few calls, and its jitter
    # otherwise lands in the strict-latency min on a fresh driver run
    for _ in range(2):
        x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True,
                               weak_symmetry=stress)
        _ = np.asarray(x[0, :4])

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = engine.equilibrate(dpT, drT, fk, bv, transposed_inputs=True,
                               weak_symmetry=stress)
        _ = np.asarray(x[0, :4])  # true sync
        times.append(time.perf_counter() - t0)
    lat = min(times)
    log(f"steady state (per-call sync): {lat*1000:.1f} ms")

    field_tag = f", {nf} fields" if nf > 1 else ""
    if stress:
        field_tag = ", weakly-symmetric stress"
    if biot:
        field_tag += " (Biot primal data)"
    prec_tag = "f64 mixed-precision" if mixed else "f32"
    metric = (f"RT{k} flux equilibration throughput, "
              f"{msh.num_cells}-cell mesh, single chip, {prec_tag}{field_tag}")

    extras = {}
    if mixed:
        # on-chip accuracy: max |div sigma_R - Pi f| evaluated in f64 on
        # device.  Valid because --mixed data is hat-compatible curl-field
        # data (see _make_data) — raw random dofs would violate the
        # invariant regardless of solver accuracy.
        from dolfinx_eqlb_tpu.eqlb.checks import check_divergence_condition
        from dolfinx_eqlb_tpu.fem import Function

        Vdg2 = FunctionSpace(msh, "DG", k - 1, vs=2)
        Vdg1 = FunctionSpace(msh, "DG", k - 1, vs=1)
        sig = Function(V, jnp.asarray(np.asarray(x[0]), jnp.float64))
        ps = Function(Vdg2, jnp.asarray(
            d_proj[0].transpose(1, 0, 2).reshape(-1)))
        pf = Function(Vdg1, jnp.asarray(d_rhs[0].reshape(-1)))
        div_err = check_divergence_condition(sig, ps, pf, return_error=True)
        extras["divergence_max_err"] = float(div_err)
        log(f"divergence residual (f64 on-chip): {div_err:.3e}")
        host = _host_divergence_check(n, k, np.asarray(x[0]),
                                      d_proj[0], d_rhs[0])
        if host is not None:
            # the backend's f64 is software-emulated, so the on-chip check
            # carries its own noise floor; the host check re-verifies the
            # downloaded dofs in true IEEE f64
            host_err, div_scale = host
            extras["divergence_max_err_host_f64"] = host_err
            # mesh-size-comparable accuracy: the absolute residual carries
            # the 1/detJ ~ 2 n^2 operator amplification of f64-floor dof
            # noise (artifacts/DIAG_MIXED_DOFS.json: dofs match an all-f64
            # CPU equilibration to 2.3e-13, which alone is ~1e-7 absolute
            # at 1M cells); err / (max|sigma_R| / h_min) removes it
            extras["divergence_rel_err"] = host_err / div_scale
            log(f"divergence residual (host f64 re-check): {host_err:.3e}"
                f" absolute, {host_err / div_scale:.3e} relative to"
                f" max|sigma|/h_min = {div_scale:.3e}")

    # strict-latency line FIRST: a mid-run kill still captures the primary
    # (< 100 ms) metric.  The pipelined headline follows as the LAST line.
    emit({
        "metric": metric + " [strict latency]",
        "value": round(npatches / lat, 1),
        "unit": "patches/s",
        "vs_baseline": round(0.1 / lat, 3),
        "latency_ms": round(lat * 1000, 2),
        **extras,
    })

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

    emit({
        "metric": metric,
        "value": round(npatches / dt, 1),
        "unit": "patches/s",
        "vs_baseline": round(0.1 / dt, 3),
        "latency_ms": round(lat * 1000, 2),
        "pipelined_ms": round(dt * 1000, 2),
        **extras,
    })
    return dt


if __name__ == "__main__":
    argv = sys.argv[1:]
    stress = "--stress" in argv
    mixed = "--mixed" in argv
    biot = "--biot" in argv
    args = [a for a in argv if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 500
    n_fields = int(args[1]) if len(args) > 1 else 1
    try:
        main(n=n, n_fields=n_fields, stress=stress, mixed=mixed, biot=biot)
    except Exception as e:  # noqa: BLE001 — the driver needs JSON, not a trace
        import traceback

        traceback.print_exc(file=sys.stderr)
        fail("run", f"{type(e).__name__}: {e}")
