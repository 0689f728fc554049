"""Function spaces, dofmaps and functions.

Replaces the DOLFINx FunctionSpace / Function machinery used throughout the
reference.  Four families on triangles:

* ``"P"``    continuous Lagrange of degree k (primal solutions, hat functions)
* ``"DG"``   discontinuous, *orthonormal Dubiner* modal basis of degree k
             (projected fluxes / RHS; mass matrix = |detJ| * I per cell)
* ``"RT"``   H(div)-conforming hierarchic Raviart-Thomas of degree k
             (equilibrated fluxes; facet dofs shared, orientation signs)
* ``"DRT"``  cell-wise (discontinuous) hierarchic RT (SE flux correctors,
             reference ``FluxEqlbSE.py:98-101``)

All dofmaps are host-precomputed int32 tables; ``Function`` holds a jnp dof
vector and evaluates via reference tabulations + Piola/affine push-forward,
fully batched over cells.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..elements.lagrange import lagrange_cached, dubiner_cached
from ..elements.rt import rt_cached
from ..mesh.topology import TriMesh

__all__ = ["FunctionSpace", "Function"]


class FunctionSpace:
    def __init__(self, mesh: TriMesh, family: str, degree: int, vs: int = 1):
        self.mesh = mesh
        self.family = family
        self.degree = degree
        nc = mesh.num_cells

        if family == "P":
            if degree < 1:
                raise ValueError("P degree >= 1")
            el = self.element = lagrange_cached(degree)
            k = degree
            nv, nf = mesh.num_vertices, mesh.num_facets
            n_edge = k - 1
            n_int = el.ndofs_cell
            self.ndofs_scalar = nv + nf * n_edge + nc * n_int
            cd = np.empty((nc, el.ndofs), dtype=np.int64)
            cd[:, :3] = mesh.cells
            for e in range(3):
                f = mesh.cell_facets[:, e].astype(np.int64)
                aligned = mesh.edge_aligned[:, e]
                for i in range(n_edge):
                    # element node order runs along the local edge direction;
                    # reverse the block when anti-aligned with the canonical
                    # (ascending-global-id) facet direction
                    ii = np.where(aligned, i, n_edge - 1 - i)
                    cd[:, 3 + e * n_edge + i] = nv + f * n_edge + ii
            base = nv + nf * n_edge
            for j in range(n_int):
                cd[:, 3 + 3 * n_edge + j] = base + np.arange(nc) * n_int + j
            self.cell_dofs = cd.astype(np.int32)
            self.dof_signs = None
            self.vs = vs
        elif family == "DG":
            el = self.element = dubiner_cached(degree)
            nd = el.ndofs
            self.ndofs_scalar = nc * nd
            self.cell_dofs = (
                np.arange(nc, dtype=np.int64)[:, None] * nd
                + np.arange(nd)[None, :]
            ).astype(np.int32)
            self.dof_signs = None
            self.vs = vs
        elif family == "RT":
            el = self.element = rt_cached(degree)
            if vs != 1:
                raise ValueError("RT is intrinsically vector-valued")
            k = degree
            nf = mesh.num_facets
            kk1 = el.ndofs_cell
            self.ndofs_scalar = nf * k + nc * kk1
            cd = np.empty((nc, el.ndofs), dtype=np.int64)
            sg = np.ones((nc, el.ndofs))
            for e in range(3):
                f = mesh.cell_facets[:, e].astype(np.int64)
                aligned = mesh.edge_aligned[:, e]
                for m in range(k):
                    cd[:, e * k + m] = f * k + m
                    # facet reversal: s -> 1-s and normal flip give the
                    # diagonal sign (-1)^(m+1) (cf. the reference's binomial
                    # transformation se/KernelData.cpp:46-64 for monomials)
                    sg[:, e * k + m] = np.where(aligned, 1.0, (-1.0) ** (m + 1))
            for j in range(kk1):
                cd[:, 3 * k + j] = nf * k + np.arange(nc) * kk1 + j
            self.cell_dofs = cd.astype(np.int32)
            self.dof_signs = sg
            self.vs = 2  # physical value shape
        elif family == "DRT":
            el = self.element = rt_cached(degree)
            nd = el.ndofs
            self.ndofs_scalar = nc * nd
            self.cell_dofs = (
                np.arange(nc, dtype=np.int64)[:, None] * nd
                + np.arange(nd)[None, :]
            ).astype(np.int32)
            self.dof_signs = None
            self.vs = 2
        else:
            raise ValueError(f"unknown family {family}")

        if family in ("P", "DG"):
            self.block_size = vs
        else:
            self.block_size = 1
        self.ndofs = self.ndofs_scalar * self.block_size

    # --- tabulation caches (host NumPy) -------------------------------------

    @lru_cache(maxsize=32)
    def _tab(self, pts_key):
        pts = np.array(pts_key)
        return self.element.tabulate(pts)

    def tabulate(self, pts: np.ndarray) -> np.ndarray:
        return self._tab(tuple(map(tuple, np.asarray(pts))))

    def new_function(self) -> "Function":
        return Function(self)


def _as_pts(pts) -> np.ndarray:
    pts = np.asarray(pts, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2:
        raise ValueError("reference points must be (nq, 2)")
    return pts


class Function:
    """FE function: dof vector over a FunctionSpace.

    dof layout: scalar spaces — plain; vector P/DG (block_size b) —
    component-major blocks ``x[comp * ndofs_scalar + scalar_dof]``.
    """

    def __init__(self, space: FunctionSpace, x=None):
        self.space = space
        if x is None:
            x = jnp.zeros(space.ndofs, dtype=jnp.float64)
        self.x = jnp.asarray(x)

    # --- expression protocol -------------------------------------------------
    @property
    def value_size(self) -> int:
        s = self.space
        return s.vs if s.family in ("RT", "DRT") else s.block_size

    def evaluate(self, qpoints_ref: np.ndarray):
        """Values at reference points in every cell -> (nc, nq, vs)."""
        s = self.space
        pts = _as_pts(qpoints_ref)
        msh = s.mesh
        gath = self.x[jnp.asarray(s.cell_dofs)] if s.block_size == 1 else None
        if s.family in ("P", "DG"):
            tab = jnp.asarray(s.tabulate(pts))  # (nd, nq)
            if s.block_size == 1:
                vals = jnp.einsum("cd,dq->cq", gath, tab)[..., None]
            else:
                comps = []
                for b in range(s.block_size):
                    xb = self.x[b * s.ndofs_scalar : (b + 1) * s.ndofs_scalar]
                    comps.append(
                        jnp.einsum("cd,dq->cq", xb[jnp.asarray(s.cell_dofs)], tab)
                    )
                vals = jnp.stack(comps, axis=-1)
            return vals
        # RT / DRT: contravariant Piola
        tab = jnp.asarray(s.tabulate(pts))  # (nd, 2, nq)
        if s.dof_signs is not None:
            gath = gath * jnp.asarray(s.dof_signs)
        ref = jnp.einsum("cd,daq->cqa", gath, tab)
        J = jnp.asarray(msh.J)
        det = jnp.asarray(msh.detJ)
        return jnp.einsum("cab,cqb->cqa", J, ref) / det[:, None, None]

    def evaluate_div(self, qpoints_ref: np.ndarray):
        """Divergence at reference points (RT/DRT only) -> (nc, nq, 1)."""
        s = self.space
        assert s.family in ("RT", "DRT")
        pts = _as_pts(qpoints_ref)
        tab = jnp.asarray(s.element.tabulate_div(pts))  # (nd, nq)
        gath = self.x[jnp.asarray(s.cell_dofs)]
        if s.dof_signs is not None:
            gath = gath * jnp.asarray(s.dof_signs)
        ref = jnp.einsum("cd,dq->cq", gath, tab)
        det = jnp.asarray(s.mesh.detJ)
        return (ref / det[:, None])[..., None]

    def evaluate_grad(self, qpoints_ref: np.ndarray):
        """Gradient (P/DG) -> (nc, nq, vs, 2): grad = K^T grad_ref."""
        s = self.space
        assert s.family in ("P", "DG")
        pts = _as_pts(qpoints_ref)
        tabg = jnp.asarray(
            s.element.tabulate_grad(pts)
        )  # (nd, 2, nq) reference grads
        K = jnp.asarray(s.mesh.K)
        out = []
        for b in range(s.block_size):
            if s.block_size == 1:
                xb = self.x
            else:
                xb = self.x[b * s.ndofs_scalar : (b + 1) * s.ndofs_scalar]
            g = jnp.einsum("cd,dbq->cqb", xb[jnp.asarray(s.cell_dofs)], tabg)
            out.append(jnp.einsum("cba,cqb->cqa", K, g))
        return jnp.stack(out, axis=-2)

    def copy(self) -> "Function":
        return Function(self.space, self.x)
