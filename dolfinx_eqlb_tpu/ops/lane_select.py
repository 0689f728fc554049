"""Pallas TPU kernel: per-row lane extraction (gather epilogue).

The semi-explicit engine's global accumulation gathers 128-lane rows of the
flat bucket solutions (full HBM bandwidth) and then needs ONE lane of each
row: ``out[i] = sum_c rows[i, c, lane[i, c]]``.  XLA's algebraic simplifier
rewrites the one-hot formulation ``sum(rows * onehot(lane))`` into a per-row
dynamic lane extract that runs ~50 GB/s (measured 16.5 ms for 830 MB at
160k cells).  This kernel keeps the one-hot multiply-reduce vectorized in
VMEM — a straight bandwidth-bound pass.

Layout: the row batch is pre-shaped (G, 8, 128) so each grid step consumes
(8, 128, C, 128) rows and emits one native (8, 128) output tile — no
in-kernel reshapes (the remote Mosaic compiler aborts on sublane/lane
reshapes of reduced values).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lane_select_sum", "lane_select_multi", "lane_select_offsets",
           "lane_select_ds"]


def _kernel(C, offs, rows_ref, lane_ref, out_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    # per-contributor / per-offset unroll, slicing at the ref level: Mosaic
    # supports only single trailing-axis reductions, and value-level integer
    # indexing of a non-minor axis lowers to an unsupported gather
    for r, off in enumerate(offs):
        acc = None
        for c in range(C):
            rows_c = rows_ref[0, :, :, c, :]  # (8, 128, 128)
            lane_c = lane_ref[0, c]  # (8, 128)
            m = ((lane_c[:, :, None] + off) == iota).astype(rows_c.dtype)
            t = jnp.sum(rows_c * m, axis=-1)  # (8, 128)
            acc = t if acc is None else acc + t
        out_ref[r, 0] = acc


@partial(jax.jit, static_argnames=("offs",))
def _run(rows, lane, offs=(0,)):
    G, _, _, C, _ = rows.shape
    R = len(offs)
    return pl.pallas_call(
        partial(_kernel, C, offs),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 128, C, 128), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 1, 8, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, G, 8, 128), rows.dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(rows, lane)


def lane_select_sum(rows, lane):
    """out[g, s, l] = sum_c rows[g, s, l, c, lane[g, c, s, l]].

    rows (G, 8, 128, C, 128); lane (G, C, 8, 128) int32 in [0, 128) —
    lane's C axis sits second so its minor dims land on a native (8, 128)
    tile (the (G, 8, 128, C) form forces a relayout copy every call).
    Returns (G, 8, 128)."""
    if jax.config.jax_enable_x64 and rows.dtype != jnp.float64:
        with jax.enable_x64(False):
            return _run(rows, lane)[0]
    return _run(rows, lane)[0]


def lane_select_multi(rows, lane, R):
    """Multi-RHS variant: out[r, g, s, l] =
    sum_c rows[g, s, l, c, lane[g, c, s, l] + r] for r in [0, R).

    One pass over the gathered rows serves all R right-hand sides (the
    engine packs the RHS axis into adjacent lanes of the flat solution
    layout), so the HBM-bound row gather is paid once, not once per RHS.
    Returns (R, G, 8, 128)."""
    return lane_select_offsets(rows, lane, tuple(range(R)))


def _kernel_ds(C, base_offs, rows_ref, lane_ref, out_ref):
    """Double-single variant: lanes hold (hi, lo) f32 plane pairs of an f64
    value at offsets (o, o+1).  The per-contributor sum of the hi planes is
    compensated with an exact 2Sum so no f32 rounding of the contributor
    addition leaks into the reconstructed f64 (the plain kernel's ``acc +
    t`` would cost ~2^-24 relative; with compensation the only loss is the
    ~2^-48 split residual).  Emits, per base offset, the compensated hi sum
    and the lo sum carrying the compensation term."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    for r, off in enumerate(base_offs):
        hi = None
        lo = None
        for c in range(C):
            rows_c = rows_ref[0, :, :, c, :]  # (8, 128, 128)
            lane_c = lane_ref[0, c]  # (8, 128)
            mh = ((lane_c[:, :, None] + off) == iota).astype(rows_c.dtype)
            ml = ((lane_c[:, :, None] + (off + 1)) == iota).astype(
                rows_c.dtype)
            h = jnp.sum(rows_c * mh, axis=-1)
            l = jnp.sum(rows_c * ml, axis=-1)
            if hi is None:
                hi, lo = h, l
            else:
                # Knuth 2Sum: s + err == hi + h exactly
                s = hi + h
                bb = s - hi
                err = (hi - (s - bb)) + (h - bb)
                hi = s
                lo = lo + l + err
        out_ref[2 * r, 0] = hi
        out_ref[2 * r + 1, 0] = lo


@partial(jax.jit, static_argnames=("base_offs",))
def _run_ds(rows, lane, base_offs):
    G, _, _, C, _ = rows.shape
    R = 2 * len(base_offs)
    return pl.pallas_call(
        partial(_kernel_ds, C, base_offs),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 128, C, 128), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 1, 8, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, G, 8, 128), rows.dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(rows, lane)


def lane_select_ds(rows, lane, base_offs):
    """Double-single gather epilogue: for each base offset o (must address
    an (hi, lo) f32 lane pair), out[2i] = compensated sum_c hi_c and
    out[2i+1] = sum_c lo_c + compensation, such that
    f64(out[2i]) + f64(out[2i+1]) == sum_c (f64(hi_c) + f64(lo_c)) up to the
    ~2^-48 lo-plane rounding.  rows (G, 8, 128, C, 128) f32;
    returns (2 * len(base_offs), G, 8, 128) f32."""
    base_offs = tuple(int(o) for o in base_offs)
    if jax.config.jax_enable_x64 and rows.dtype != jnp.float64:
        with jax.enable_x64(False):
            return _run_ds(rows, lane, base_offs)
    return _run_ds(rows, lane, base_offs)


def lane_select_offsets(rows, lane, offsets):
    """Arbitrary static lane offsets: out[i, g, s, l] =
    sum_c rows[g, s, l, c, lane[g, c, s, l] + offsets[i]].

    Serves the RHS-BLOCK packed flat layout (lanes [r*W, (r+1)*W) hold RHS
    r), where the offsets per output channel are strided (m + W * r for
    pair member m), not consecutive.  Returns (len(offsets), G, 8, 128)."""
    offsets = tuple(int(o) for o in offsets)
    if jax.config.jax_enable_x64 and rows.dtype != jnp.float64:
        with jax.enable_x64(False):
            return _run(rows, lane, offsets)
    return _run(rows, lane, offsets)
