"""Pallas TPU kernel: batched dense solve of the per-patch KKT systems.

XLA's batched ``jnp.linalg.solve`` lowers to a LuDecomposition custom call
that makes O(D) *serial passes over HBM* (measured: 1.6 s for a
62k x 57 x 57 f32 batch on v5e — the entire equilibration bottleneck).
This kernel keeps each tile of patch systems resident in VMEM and performs
the full pivot-free LU + forward/backward substitution on-chip, so HBM
traffic is one read of A/b and one write of x.

Pivot-free LU is sound for the equilibration KKT systems: ordered
[sigma | r | lambda] the leading block is SPD (flux mass, essential rows
replaced by identity), the middle Schur complement is negative definite up
to the mean mode, and the bordered lambda pivot is strictly negative when
active / exactly one when masked (see eqlb.engine docstring) — the same
structural argument as for symmetric quasi-definite matrices.

``interpret=True`` is used automatically off-TPU so the kernel is exercised
by the CPU test-suite.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_kkt_solve"]


def _kernel(D: int, R: int, A_ref, b_ref, x_ref):
    A = A_ref[:]  # (T, D, D)
    b = b_ref[:]  # (T, D, R)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, D, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)

    # in-place pivot-free LU with fused forward substitution
    for j in range(D):
        piv = A[:, j, j]  # (T,)
        inv = 1.0 / piv
        Lcol = A[:, :, j] * inv[:, None]  # (T, D)
        below = rows[:, :, 0] > j  # (1, D)
        Lcol = jnp.where(below, Lcol, 0.0)
        rowj = A[:, j, :]  # (T, D)
        upd = Lcol[:, :, None] * rowj[:, None, :]
        A = A - jnp.where(cols > j, upd, 0.0)
        b = b - Lcol[:, :, None] * b[:, j, :][:, None, :]

    # back substitution: x_j = (b_j - sum_{k>j} U_jk x_k) / U_jj
    x = jnp.zeros_like(b)
    for j in range(D - 1, -1, -1):
        Urow = jnp.where(cols[0] > j, A[:, j, :], 0.0)  # (T, D)
        acc = jnp.sum(Urow[:, :, None] * x, axis=1)  # (T, R)
        xj = (b[:, j, :] - acc) / A[:, j, j][:, None]
        x = x.at[:, j, :].set(xj)
    x_ref[:] = x.astype(x_ref.dtype)


@partial(jax.jit, static_argnames=("tile",))
def _solve_padded(A, b, tile):
    P, D, _ = A.shape
    R = b.shape[-1]
    grid = (P // tile,)
    return pl.pallas_call(
        partial(_kernel, D, R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, D, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D, R), b.dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(A, b)


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
    if tile is None:
        # keep A-tile + temporaries well under VMEM (~16 MB): lanes pad D
        # to a multiple of 128
        lanes = -(-D // 128) * 128
        tile = max(8, min(256, int(2.5 * 2**20 / (D * lanes * 4))))
    pad = (-Pt) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(D, dtype=A.dtype), (pad, D, D))
        A2 = jnp.concatenate([A2, eye])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, D, R), b.dtype)])
    x = _solve_padded(A2, b2, tile)
    if pad:
        x = x[:Pt]
    return x.reshape(lead + (P, D, R))
