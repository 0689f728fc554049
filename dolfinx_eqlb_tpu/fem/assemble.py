"""Batched assembly utilities.

The reference assembles forms through FFCx-generated ``tabulate_tensor``
kernels driven by per-cell C++ loops (``base/local_solver.hpp:107-185``).
Here every element tensor is a closed-form contraction of constant reference
tensors with per-cell geometry factors (affine cells), evaluated batched for
the whole mesh in one XLA op.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..elements.quadrature import gauss_triangle
from .expressions import as_expr

__all__ = ["cell_integrals", "assemble_scalar"]


def cell_integrals(expr, quadrature_degree: int):
    """Per-cell integrals of a scalar expression -> (nc,) jnp array.

    Used for the DG0 error-estimator vectors (reference
    ``demo_error_estimation.py:104-112`` assembles ``err^2 * v * dx`` with a
    DG0 test function — identical to per-cell integration).
    """
    e = as_expr(expr)
    pts, w = gauss_triangle(quadrature_degree)
    vals = e.evaluate(pts)  # (nc, nq, 1)
    adet = jnp.abs(jnp.asarray(e.mesh.detJ))
    return adet * jnp.einsum("q,cq->c", jnp.asarray(w), vals[..., 0])


def cell_integrals_sq(expr, quadrature_degree: int):
    """Per-cell integrals of |expr|^2 (any value size) -> (nc,)."""
    e = as_expr(expr)
    pts, w = gauss_triangle(quadrature_degree)
    vals = e.evaluate(pts)  # (nc, nq, vs)
    adet = jnp.abs(jnp.asarray(e.mesh.detJ))
    return adet * jnp.einsum("q,cqa,cqa->c", jnp.asarray(w), vals, vals)


def assemble_scalar(expr, quadrature_degree: int):
    """Integral of a scalar expression over the whole mesh."""
    return cell_integrals(expr, quadrature_degree).sum()
