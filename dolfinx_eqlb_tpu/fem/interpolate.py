"""Dof-functional interpolation into RT / DRT / P spaces.

The RT interpolation operator is the backbone of the reference's boundary
machinery (``base/KernelData.cpp:190-268`` extracts the per-facet
interpolation matrix M) and of the jump-condition checker
(``check_eqlb_conditions.py:294-359`` compares a function with its RT
interpolant).  Batched over all cells / facets.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..elements.polynomials import legendre_shifted, poly_eval
from ..elements.quadrature import (
    REF_EDGE_ROTT,
    facet_param_points,
    gauss_interval,
    gauss_triangle,
)
from ..elements.lagrange import dubiner_cached
from .spaces import Function, FunctionSpace
from .expressions import as_expr

__all__ = ["interpolate", "project_facet_trace"]


def project_facet_trace(mesh, facets, g, degree: int, quadrature_degree=None):
    """Per-facet L2 projection of ``g(x)`` onto P_{degree-1} along the
    canonical facet direction; returns shifted-Legendre coefficients
    (nfacets, degree).  Used to feed *identical* data to the primal Neumann
    load and the flux BCs (cf. the reference's shared UFL expression)."""
    facets = np.asarray(facets, dtype=np.int64)
    nq = max(degree + 1, ((quadrature_degree or 2 * degree + 16) + 2) // 2)
    s, w = gauss_interval(nq)
    leg = legendre_shifted(degree - 1)
    legv = np.array([np.polyval(leg[m, ::-1], s) for m in range(degree)])
    lo = mesh.points[mesh.facet_vertices[facets, 0]]
    T = mesh.facet_tangent[facets]
    xq = lo[:, None, :] + np.einsum("q,fa->fqa", s, T)
    gv = np.asarray(g(xq))
    scale = 2.0 * np.arange(degree) + 1.0  # 1 / ||P~_j||^2
    return np.einsum("q,jq,fq,j->fj", w, legv, gv, scale)


def _reference_rt_dofs(V: FunctionSpace, e, nq_facet: int, qdeg_cell: int):
    """Per-cell reference dof functionals of the pull-back of expression e.

    Returns (nc, nrt): row layout [facet dofs (3k), div dofs, interior dofs].
    Facet dofs are the *reference* functionals l_{e,m}; the conversion to
    globally-oriented dofs is a sign handled by the caller.
    """
    msh = V.mesh
    el = V.element
    k = V.degree
    s, w = gauss_interval(nq_facet)
    leg = legendre_shifted(k - 1)
    legv = np.array([np.polyval(leg[m, ::-1], s) for m in range(k)])  # (k,nq)
    K = jnp.asarray(msh.K)
    det = jnp.asarray(msh.detJ)

    cols = []
    # facet dofs: vhat = detJ * K v at edge points, dotted with rot(t_e)
    pts_e = facet_param_points(s)  # (3, nq, 2)
    for eidx in range(3):
        v = e.evaluate(pts_e[eidx])  # (nc, nq, 2)
        vhat = det[:, None, None] * jnp.einsum("cab,cqb->cqa", K, v)
        vn = (
            REF_EDGE_ROTT[eidx, 0] * vhat[..., 0]
            + REF_EDGE_ROTT[eidx, 1] * vhat[..., 1]
        )  # (nc, nq)
        cols.append(jnp.einsum("q,mq,cq->cm", jnp.asarray(w), jnp.asarray(legv), vn))
    out = [jnp.concatenate(cols, axis=1)]

    if el.ndofs_cell > 0:
        pts, wc = gauss_triangle(qdeg_cell)
        dub = dubiner_cached(k - 1)
        dv = jnp.asarray(dub.tabulate(np.asarray(pts)))  # (ndg, nq)
        divv = e.evaluate_div(pts)[..., 0]  # (nc, nq)
        # int_That divhat(vhat) Q_p = int detJ (div v) Q_p
        div_dofs = jnp.einsum(
            "q,c,cq,pq->cp", jnp.asarray(wc), det, divv, dv[1:]
        )
        out.append(div_dofs)
        if el.ndofs_cell_int > 0:
            v = e.evaluate(pts)
            vhat = det[:, None, None] * jnp.einsum("cab,cqb->cqa", K, v)
            monos = []
            for l in range(1, k - 1):
                for m in range(0, k - 1 - l):
                    monos.append(pts[:, 0] ** l * pts[:, 1] ** m)
            mono = jnp.asarray(np.array(monos))  # (nint, nq)
            out.append(
                jnp.einsum("q,cq,pq->cp", jnp.asarray(wc), vhat[..., 1], mono)
            )
    return jnp.concatenate(out, axis=1)


def interpolate(V: FunctionSpace, data, quadrature_degree=None) -> Function:
    """Interpolate an expression into V by applying V's dof functionals.

    For non-polynomial data the facet/cell quadrature (controlled by
    ``quadrature_degree``) commits a consistent approximation, mirroring the
    reference's expression-kernel evaluation at interpolation points
    (``bcs.py:64-121``).
    """
    e = as_expr(data, V.mesh)
    msh = V.mesh

    if V.family == "P":
        vals = e.evaluate(V.element.nodes)  # (nc, nnodes, vs)
        xs = []
        for b in range(V.block_size):
            xb = (
                jnp.zeros(V.ndofs_scalar)
                .at[jnp.asarray(V.cell_dofs)]
                .set(vals[..., b])
            )
            xs.append(xb)
        return Function(V, jnp.concatenate(xs))

    if V.family not in ("RT", "DRT"):
        raise ValueError(f"interpolate into {V.family} not supported")

    k = V.degree
    if quadrature_degree is None:
        quadrature_degree = 2 * k + 2
    nq_facet = max(k + 1, (quadrature_degree + 2) // 2)
    dofs_ref = _reference_rt_dofs(V, e, nq_facet, quadrature_degree)

    if V.family == "DRT":
        x = jnp.zeros(V.ndofs).at[jnp.asarray(V.cell_dofs)].set(dofs_ref)
        return Function(V, x)

    # conforming RT: globally-oriented dof = sign * reference dof, taken from
    # the facet's first adjacent cell (sides agree iff data is in H(div))
    sg = jnp.asarray(V.dof_signs)
    oriented = dofs_ref * sg  # (nc, nrt): global dof values per cell
    x = jnp.zeros(V.ndofs)
    cell_dofs = jnp.asarray(V.cell_dofs)
    own_cell = jnp.asarray(msh.facet_cells[:, 0].astype(np.int64))
    own_loc = jnp.asarray(msh.facet_local[:, 0].astype(np.int64))
    for m in range(k):
        vals = oriented[own_cell, own_loc * k + m]
        x = x.at[jnp.asarray(np.arange(msh.num_facets) * k + m)].set(vals)
    # cell dofs (unshared)
    if V.element.ndofs_cell > 0:
        x = x.at[cell_dofs[:, 3 * k :]].set(oriented[:, 3 * k :])
    return Function(V, x)
