"""Pallas TPU kernel: batched dense solve of the per-patch KKT systems.

XLA's batched ``jnp.linalg.solve`` lowers to a LuDecomposition custom call
that makes O(D) *serial passes over HBM* (measured: 1.6 s for a
62k x 57 x 57 f32 batch on v5e — the entire equilibration bottleneck).
This kernel keeps a tile of patch systems resident in VMEM and performs the
full pivot-free LU + forward/backward substitution on-chip.

Layout: systems are stored *batch-last*, A[d_row, d_col, patch] — the lane
dimension is the patch batch (always a multiple of 128), so no vector-tiling
padding is wasted on the small D x D systems, and every row/column
extraction is a cheap (D, T) slab op.

Pivot-free LU is sound for the equilibration KKT systems: ordered
[sigma | r] the leading block is SPD (flux mass, essential rows replaced by
identity) and the regularized constraint Schur complement is positive
definite (see eqlb.engine: the mean-value multiplier enters as an exact
rank-1 regularization precisely so that no zero pivot occurs).

Mosaic notes (hard-won): Python-unrolled ~2D-step kernels fail to compile;
fori_loop lowers by unbounded recursion; value-level dynamic_slice is
unimplemented — hence one elimination step per *grid* iteration with
VMEM scratch carried across the inner grid dimension, and all dynamic
indexing through ``pl.ds`` ref slices.  ``interpret=True`` off-TPU so the
CPU test-suite exercises the kernel.  Index-map literals must be traced
with x64 disabled (i64 constants fail to legalize).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_kkt_solve", "batched_kkt_solve_bl"]


def _kernel(D: int, R: int, K: int, A_ref, b_ref, x_ref, As, bs):
    """K elimination steps per inner grid iteration (D % K == 0).

    First D/K grid steps: pivot-free LU column elimination fused with
    forward substitution.  Last D/K: back substitution accumulated into bs.
    One-step-per-grid-iteration costs ~8 us of fixed sequencer overhead
    (measured: 55k grid steps = 440 ms regardless of math), so K steps are
    unrolled per iteration.  Shapes: A (D, D, T); b/x (D, R, T).
    """
    j2 = pl.program_id(1)
    nfwd = D // K
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, 1, 1), 0)
    rcol = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)

    @pl.when(j2 == 0)
    def _():
        As[:] = A_ref[:]
        bs[:] = b_ref[:]

    @pl.when(j2 < nfwd)
    def _():
        A = As[:]
        b = bs[:]
        for l in range(K):
            j = j2 * K + l
            rowj = jnp.sum(jnp.where(rows == j, A, 0.0), axis=0)  # (D->, T)
            # rowj has shape (D?, T): reduce over rows axis of (D,D,T)
            piv = jnp.sum(jnp.where(rcol == j, rowj, 0.0), axis=0)  # (T,)
            colj = jnp.sum(
                jnp.where(rows.transpose(1, 0, 2) == j, A, 0.0), axis=1
            )  # (D, T)
            Lcol = jnp.where(rcol > j, colj / piv[None, :], 0.0)  # (D, T)
            upd = Lcol[:, None, :] * rowj[None, :, :]
            A = A - jnp.where(rows.transpose(1, 0, 2) > j, upd, 0.0)
            bj = jnp.sum(jnp.where(rows[:, :1] == j, b, 0.0), axis=0)  # (R,T)
            b = b - Lcol[:, None, :] * bj[None, :, :]
        As[:] = A
        bs[:] = b

    @pl.when(j2 >= nfwd)
    def _():
        A = As[:]
        b = bs[:]
        for l in range(K):
            j = D - 1 - ((j2 - nfwd) * K + l)
            rowj = jnp.sum(jnp.where(rows == j, A, 0.0), axis=0)
            piv = jnp.sum(jnp.where(rcol == j, rowj, 0.0), axis=0)
            Urow = jnp.where(rcol > j, rowj, 0.0)
            xs = jnp.where(rows > j, b, 0.0)  # rows > j already hold x_k
            acc = jnp.sum(Urow[:, None, :] * xs, axis=0)  # (R, T)
            bj = jnp.sum(jnp.where(rows[:, :1] == j, b, 0.0), axis=0)
            xj = (bj - acc) / piv[None, :]
            b = jnp.where(rows == j, xj[None, :, :], b)
        bs[:] = b

    @pl.when(j2 == 2 * nfwd - 1)
    def _():
        x_ref[:] = bs[:].astype(x_ref.dtype)


@partial(jax.jit, static_argnames=("tile", "K"))
def _solve_padded(A, b, tile, K):
    """A: (D, D, P); b: (D, R, P) — batch-last layout, P % tile == 0,
    D % K == 0."""
    D = A.shape[0]
    R = b.shape[1]
    P = A.shape[-1]
    grid = (P // tile, 2 * (D // K))
    return pl.pallas_call(
        partial(_kernel, D, R, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, D, tile), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, R, tile), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, R, tile), lambda i, j: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, R, P), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, D, tile), A.dtype),
            pltpu.VMEM((D, R, tile), b.dtype),
        ],
        interpret=(jax.default_backend() != "tpu"),
    )(A, b)


def batched_kkt_solve_bl(A, b, tile: int | None = None):
    """Batch-last entry: A (D, D, X), b (D, R, X) -> x (D, R, X).

    The native layout of the kernel — no moveaxis relayouts (a transpose of
    (X, D, D) tiny-trailing-dim tensors costs more than the solve itself on
    TPU).  D is padded to the unroll factor with identity rows, X to the
    VMEM tile with identity systems."""
    D = A.shape[0]
    R = b.shape[1]
    X = A.shape[-1]
    K = 8
    Dp = -(-D // K) * K
    if Dp != D:
        A = jnp.pad(A, ((0, Dp - D), (0, Dp - D), (0, 0)))
        A = A + jnp.pad(
            jnp.eye(Dp, dtype=A.dtype)[:, D:], ((0, 0), (D, 0))
        )[:, :, None]
        b = jnp.pad(b, ((0, Dp - D), (0, 0), (0, 0)))
    if tile is None:
        # VMEM budget: double-buffered A/b input blocks + scratches + out
        # (~3 Dp^2 + 5 Dp R floats per batch lane, observed)
        tile = max(128, min(1024, int(
            7.0 * 2**20 / (4.0 * (3 * Dp * Dp + 5 * Dp * R))
        )))
        tile -= tile % 128
    pad = (-X) % tile
    if pad:
        A = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(Dp, dtype=A.dtype)[:, :, None],
                                 (Dp, Dp, pad))], axis=-1
        )
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    if jax.config.jax_enable_x64 and A.dtype != jnp.float64:
        with jax.enable_x64(False):
            x = _solve_padded(A, b, tile, K)
    else:
        x = _solve_padded(A, b, tile, K)
    return x[:D, :, :X]


def batched_kkt_solve(A, b, tile: int | None = None):
    """Solve A @ x = b for a batch of KKT systems, pivot-free, on-chip.

    A: (..., P, D, D); b: (..., P, D, R).  Leading batch axes are folded in.
    The batch is padded to the tile size with identity systems.
    """
    lead = A.shape[:-3]
    P, D, _ = A.shape[-3:]
    R = b.shape[-1]
    A2 = A.reshape((-1, D, D))
    b2 = b.reshape((-1, D, R))
    Pt = A2.shape[0]
    # pad D to a multiple of the per-grid-step unroll factor with identity
    # rows (solutions of the pad rows are zero and never used)
    K = 8
    Dp = -(-D // K) * K
    if Dp != D:
        A2 = jnp.concatenate(
            [A2, jnp.zeros((Pt, D, Dp - D), A.dtype)], axis=2
        )
        ext = jnp.zeros((Pt, Dp - D, Dp), A.dtype) + jnp.eye(
            Dp, dtype=A.dtype
        )[D:][None]
        A2 = jnp.concatenate([A2, ext], axis=1)
        b2 = jnp.concatenate(
            [b2, jnp.zeros((Pt, Dp - D, R), b.dtype)], axis=1
        )
    if tile is None:
        # VMEM budget: double-buffered A/b input blocks + scratches + out
        tile = max(128, min(1024, int(
            7.0 * 2**20 / (4.0 * (3 * Dp * Dp + 5 * Dp * R))
        )))
        tile -= tile % 128
    pad = (-Pt) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(Dp, dtype=A.dtype), (pad, Dp, Dp))
        A2 = jnp.concatenate([A2, eye])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, Dp, R), b.dtype)])
    At = jnp.moveaxis(A2, 0, -1)  # (D, D, P)
    bt = jnp.moveaxis(b2, 0, -1)  # (D, R, P)
    # trace with 32-bit index types: under jax_enable_x64 the BlockSpec
    # index-map literals become i64, which Mosaic fails to legalize.  (f64
    # data only occurs on the CPU/interpret path, where i64 is fine.)
    if jax.config.jax_enable_x64 and A2.dtype != jnp.float64:
        with jax.enable_x64(False):
            xt = _solve_padded(At, bt, tile, K)
    else:
        xt = _solve_padded(At, bt, tile, K)
    x = jnp.moveaxis(xt, -1, 0)
    x = x[:Pt, :D]
    return x.reshape(lead + (P, D, R))
