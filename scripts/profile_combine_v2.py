"""Premise test for the RHS-BLOCK packed, destination-segmented combine.

The current 3-field combine runs three per-field paired passes (125 ms at
1M cells) because the single R = 3 lane-INTERLEAVED pass (a) packs the
three fields with a minor-dim lane shuffle XLA executes poorly and (b) its
~150 MB packed source falls off the TPU gather's ~128 MB cache cliff
(PROFILE_COMBINE_STRATEGIES.json: 180 ms).

Two candidate fixes, measured here head-to-head on the real chip:

  * RHS-BLOCK packing: lanes [r*W, (r+1)*W) of a 128-lane row hold RHS r
    (W = 32), so the pack is a pad + reshape + minor-axis concat — no lane
    interleave — and the select epilogue reads strided offsets
    m + W * r (ops.lane_select_offsets);
  * destination segmentation: dof pairs are emitted in dof order and their
    contributor positions are patch-major, so consecutive dof blocks draw
    from a narrow band of source rows.  Splitting the gather into segments
    whose source row-band is < 120 MB and slicing the packed source keeps
    every pass cache-resident while retaining the R = 3 index count (one
    index per 2 dofs x 3 RHS).

Writes artifacts/PROFILE_COMBINE_V2.json.
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


def shaped(src, W):
    """rows/lane tables for the RHS-block layout: lane = pos % W (offset
    strides W are applied at select time)."""
    from dolfinx_eqlb_tpu import native

    out = native.shaped_tables(np.ascontiguousarray(src, np.int32), W, 1)
    if out is not None:
        return out
    M, C = src.shape
    pad = (-M) % 1024
    s = np.pad(src, ((0, pad), (0, 0)))
    lane = (s % W).reshape(-1, 8, 128, C)
    return ((s // W).reshape(-1).astype(np.int32),
            np.ascontiguousarray(np.moveaxis(lane, 3, 1)).astype(np.int32))


def segments(src, W, max_rows):
    """Greedy destination segmentation: consecutive 1024-pair blocks whose
    joint contributor row-band stays under max_rows.  Returns a list of
    (block0, block1, rowmin, rowmax_inclusive)."""
    M = src.shape[0]
    G = -(-M // 1024)
    spans = []
    for b in range(G):
        s = src[b * 1024: (b + 1) * 1024]
        spans.append((int(s.min()) // W, int(s.max()) // W))
    segs = []
    b0, lo, hi = 0, spans[0][0], spans[0][1]
    for b in range(1, G):
        nlo, nhi = min(lo, spans[b][0]), max(hi, spans[b][1])
        if nhi - nlo + 1 > max_rows:
            segs.append((b0, b, lo, hi))
            b0, lo, hi = b, spans[b][0], spans[b][1]
        else:
            lo, hi = nlo, nhi
    segs.append((b0, G, lo, hi))
    return segs


def main(n=500, k=2):
    from dolfinx_eqlb_tpu.mesh import unit_square
    from dolfinx_eqlb_tpu.fem import FunctionSpace
    from dolfinx_eqlb_tpu.eqlb.patches import build_patches
    from dolfinx_eqlb_tpu.eqlb.engine import EqlbEngine
    from dolfinx_eqlb_tpu.ops.lane_select import lane_select_offsets

    msh = unit_square(n)
    buckets = build_patches(msh)
    V = FunctionSpace(msh, "RT", k)
    engine = EqlbEngine(V, buckets, dtype=jnp.float32,
                        max_patches_per_bucket=131072)
    engine.solver = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert engine._patch_major, "paired tables required"
    cm = engine._combine
    _, refd = engine._device_tables()
    engine._ensure_combine_tables(1)  # off-TPU reference path (elem tables)
    ndofs = V.ndofs
    nfk = cm["nfk"]
    Lf = engine._flat_len

    R, W = 3, 32
    Lpos = -(-(Lf + 1) // W) * W
    nrows = Lpos // W
    max_rows = int(float(os.environ.get("EQLB_V2_MAX_SRC_MB", 120)) * 1e6
                   // 512)

    t0 = time.perf_counter()
    r01, l01 = shaped(cm["pair01"], W)
    r2, l2 = shaped(cm["pair2"], W)
    seg01 = segments(cm["pair01"], W, max_rows)
    seg2 = segments(cm["pair2"], W, max_rows)
    t_tables = time.perf_counter() - t0

    prof = {
        "n": n, "ncells": msh.num_cells, "L": Lf, "nrows": nrows,
        "src_mb_packed": nrows * 512 / 1e6,
        "seg01_n": len(seg01), "seg2_n": len(seg2),
        "seg01_head": [list(s) for s in seg01[:4]],
        "tables_s": t_tables,
    }

    # index tables enter every jit as ARGUMENTS (closed-over device arrays
    # embed as constants and stall the compile constant-folding them)
    T = {
        "r01": jnp.asarray(r01), "l01": jnp.asarray(l01),
        "r2": jnp.asarray(r2), "l2": jnp.asarray(l2),
    }
    offs = tuple(r * W + m for r in range(R) for m in range(2))

    rng = np.random.default_rng(0)
    flat3 = jnp.asarray(rng.normal(size=(R, Lf)).astype(np.float32))

    def pack_blocks(f):
        f = jnp.pad(f, ((0, 0), (0, Lpos - f.shape[1])))
        rows = jnp.concatenate(
            [f[r].reshape(nrows, W) for r in range(R)], axis=1)
        return jnp.pad(rows, ((0, 0), (0, 128 - R * W)))

    def pack_interleave(f):
        Lp = engine._lpad(R)
        Wd = 128 // R
        f = jnp.pad(f, ((0, 0), (0, Lp - f.shape[1])))
        f2p = jnp.moveaxis(f, 0, 1).reshape(-1, Wd * R)
        return jnp.pad(f2p, ((0, 0), (0, 128 - Wd * R)))

    def gsel(f2p, rows_flat, lane, C, rebase=0):
        G = lane.shape[0]
        rg = jnp.clip(rows_flat - rebase, 0, f2p.shape[0] - 1)
        out = lane_select_offsets(
            f2p[rg].reshape(G, 8, 128, C, 128), lane, offs)
        arr = out.reshape(R, 2, -1)
        return jnp.moveaxis(arr, 1, -1).reshape(R, -1)

    def combine_full(f, t):
        f2p = pack_blocks(f)
        x = gsel(f2p, t["r01"], t["l01"], 2)[:, :ndofs]
        tail = gsel(f2p, t["r2"], t["l2"], 1)[:, : ndofs - nfk]
        return x.at[:, nfk:].add(tail)

    def combine_split(f, t):
        f2p = pack_blocks(f)
        parts = []
        for (b0, b1, lo, hi) in seg01:
            src = jax.lax.slice_in_dim(f2p, lo, hi + 1)
            rf = jax.lax.slice_in_dim(t["r01"], b0 * 2048, b1 * 2048)
            lf = jax.lax.slice_in_dim(t["l01"], b0, b1)
            parts.append(gsel(src, rf, lf, 2, rebase=lo))
        x = jnp.concatenate(parts, axis=1)[:, :ndofs]
        parts = []
        for (b0, b1, lo, hi) in seg2:
            src = jax.lax.slice_in_dim(f2p, lo, hi + 1)
            rf = jax.lax.slice_in_dim(t["r2"], b0 * 1024, b1 * 1024)
            lf = jax.lax.slice_in_dim(t["l2"], b0, b1)
            parts.append(gsel(src, rf, lf, 1, rebase=lo))
        tail = jnp.concatenate(parts, axis=1)[:, : ndofs - nfk]
        return x.at[:, nfk:].add(tail)

    def ref(f, rd):
        parts = [engine._combine_flat(f[r: r + 1], rd) for r in range(R)]
        return jnp.concatenate(parts, axis=0)

    # ---- chunk-permuted variant ------------------------------------------
    # Destination locality fails on the raw layout (a facet's two patches
    # sit ~half the mesh apart: center vertices are numbered after corner
    # vertices AND live in a different bucket).  Permuting the packed source
    # at W-position chunk granularity by "min destination dof touching the
    # chunk" (static argsort) makes destination windows mesh-row-sized.
    key = np.full(nrows, np.iinfo(np.int64).max, np.int64)
    M01 = cm["pair01"].shape[0]
    ch01 = cm["pair01"].astype(np.int64) // W
    np.minimum.at(key, ch01.ravel(),
                  np.repeat(np.arange(M01, dtype=np.int64) * 2, 2))
    ch2 = cm["pair2"].astype(np.int64) // W
    np.minimum.at(key, ch2.ravel(), nfk + np.arange(ch2.shape[0]) * 2)
    chunk_perm = np.argsort(key, kind="stable").astype(np.int32)
    inv_chunk = np.empty_like(chunk_perm)
    inv_chunk[chunk_perm] = np.arange(nrows, dtype=np.int32)

    def pshape(src):
        p = src.astype(np.int64)
        s = (inv_chunk[p // W].astype(np.int64) * W + p % W).astype(np.int64)
        return shaped(s.astype(np.int64), W)

    pr01, pl01 = pshape(cm["pair01"])
    pr2, pl2 = pshape(cm["pair2"])
    pseg01 = segments(
        (inv_chunk[ch01] * W + cm["pair01"].astype(np.int64) % W), W,
        max_rows)
    pseg2 = segments(
        (inv_chunk[ch2] * W + cm["pair2"].astype(np.int64) % W), W, max_rows)
    prof["pseg01_n"] = len(pseg01)
    prof["pseg2_n"] = len(pseg2)
    T["pr01"] = jnp.asarray(pr01)
    T["pl01"] = jnp.asarray(pl01)
    T["pr2"] = jnp.asarray(pr2)
    T["pl2"] = jnp.asarray(pl2)
    T["chunk_perm"] = jnp.asarray(chunk_perm)

    def pack_perm(f, t):
        f = jnp.pad(f, ((0, 0), (0, Lpos - f.shape[1])))
        rows = jnp.concatenate(
            [f[r].reshape(nrows, W)[t["chunk_perm"]] for r in range(R)],
            axis=1)
        return jnp.pad(rows, ((0, 0), (0, 128 - R * W)))

    def pack_stack(f):
        f = jnp.pad(f, ((0, 0), (0, Lpos - f.shape[1])))
        rows = jnp.stack(
            [f[r].reshape(nrows, W) for r in range(R)], axis=0)
        rows = rows.transpose(1, 0, 2).reshape(nrows, R * W)
        return jnp.pad(rows, ((0, 0), (0, 128 - R * W)))

    def combine_perm(f, t):
        f2p = pack_perm(f, t)
        parts = []
        for (b0, b1, lo, hi) in pseg01:
            src = jax.lax.slice_in_dim(f2p, lo, hi + 1)
            rf = jax.lax.slice_in_dim(t["pr01"], b0 * 2048, b1 * 2048)
            lf = jax.lax.slice_in_dim(t["pl01"], b0, b1)
            parts.append(gsel(src, rf, lf, 2, rebase=lo))
        x = jnp.concatenate(parts, axis=1)[:, :ndofs]
        parts = []
        for (b0, b1, lo, hi) in pseg2:
            src = jax.lax.slice_in_dim(f2p, lo, hi + 1)
            rf = jax.lax.slice_in_dim(t["pr2"], b0 * 1024, b1 * 1024)
            lf = jax.lax.slice_in_dim(t["pl2"], b0, b1)
            parts.append(gsel(src, rf, lf, 1, rebase=lo))
        tail = jnp.concatenate(parts, axis=1)[:, : ndofs - nfk]
        return x.at[:, nfk:].add(tail)

    jfull = jax.jit(combine_full)
    jperm = jax.jit(combine_perm)
    jref = jax.jit(ref)
    jpackb = jax.jit(pack_blocks)
    jpacks = jax.jit(pack_stack)
    jpackp = jax.jit(pack_perm)

    log = lambda m: print(m, file=sys.stderr, flush=True)  # noqa: E731
    t0 = time.perf_counter()
    xr = jref(flat3, refd)
    sync(xr)
    log(f"ref compiled {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    dev_full = float(jnp.max(jnp.abs(jfull(flat3, T) - xr)))
    log(f"full compiled {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    dev_perm = float(jnp.max(jnp.abs(jperm(flat3, T) - xr)))
    log(f"perm compiled {time.perf_counter()-t0:.1f}s")
    prof["dev_full"] = dev_full
    prof["dev_perm"] = dev_perm
    assert dev_full == 0.0 and dev_perm == 0.0, (dev_full, dev_perm)

    prof["pack_blocks_ms"] = timeit(jpackb, flat3) * 1000
    prof["pack_stack_ms"] = timeit(jpacks, flat3) * 1000
    prof["pack_perm_ms"] = timeit(jpackp, flat3, T) * 1000
    prof["ref_3xR1_ms"] = timeit(jref, flat3, refd) * 1000
    prof["rhsblock_full_ms"] = timeit(jfull, flat3, T) * 1000
    prof["chunkperm_split_ms"] = timeit(jperm, flat3, T) * 1000
    prof["backend"] = jax.default_backend()
    prof["device"] = str(jax.devices()[0])
    for nm in ("pack_blocks_ms", "pack_stack_ms", "pack_perm_ms",
               "ref_3xR1_ms", "rhsblock_full_ms", "chunkperm_split_ms"):
        print(f"{nm}: {prof[nm]:.1f}", flush=True)

    outp = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "PROFILE_COMBINE_V2.json")
    with open(outp, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
