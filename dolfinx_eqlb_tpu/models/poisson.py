"""Primal Poisson solver: -div(grad u) = f.

Role of the PETSc CG+BoomerAMG primal solve in the reference demos
(``demo_reconstruction.py:256-344``): a matrix-free Jacobi-preconditioned CG
on device.  The element stiffness is the contraction of a constant reference
tensor Shat_ab[i,j] = int grad_a(phi_i) grad_b(phi_j) with per-cell geometry
factors G = |detJ| K K^T, so the operator action is a gather + einsum +
segment-sum — no sparse matrix is ever formed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..elements.quadrature import facet_param_points, gauss_interval, gauss_triangle
from ..fem.spaces import Function, FunctionSpace
from ..fem.expressions import as_expr
from ..mesh.topology import TriMesh

__all__ = ["PoissonSolver", "locate_dofs_on_facets"]


def locate_dofs_on_facets(V: FunctionSpace, facets: np.ndarray) -> np.ndarray:
    """Scalar dofs of a P space topologically on the given facets
    (the role of ``fem.locate_dofs_topological``, demo_reconstruction.py:320)."""
    assert V.family == "P"
    msh = V.mesh
    k = V.degree
    facets = np.asarray(facets, dtype=np.int64)
    dofs = [msh.facet_vertices[facets].ravel().astype(np.int64)]
    if k >= 2:
        n_edge = k - 1
        base = msh.num_vertices
        dofs.append(
            (base + facets[:, None] * n_edge + np.arange(n_edge)[None, :]).ravel()
        )
    return np.unique(np.concatenate(dofs))


class PoissonSolver:
    def __init__(self, V: FunctionSpace, quadrature_degree: int | None = None,
                 coefficient=None):
        """``coefficient``: optional cell-wise diffusion kappa — an array
        (ncells,) or a callable evaluated at cell centroids (the Kellogg
        checkerboard demo, reference ``poisson_adaptive/demo_discont-coeff.py``)."""
        assert V.family == "P" and V.block_size == 1
        self.V = V
        msh = V.mesh
        k = V.degree
        qdeg = quadrature_degree or 2 * k
        pts, w = gauss_triangle(qdeg)
        tabg = V.element.tabulate_grad(pts)  # (nd, 2, nq)
        Shat = np.einsum("q,iaq,jbq->abij", w, tabg, tabg)
        self.Shat = jnp.asarray(Shat)
        K = msh.K
        if coefficient is None:
            kap = np.ones(msh.num_cells)
        elif callable(coefficient):
            cent = msh.map_points(np.array([[1 / 3, 1 / 3]]))[:, 0]
            kap = np.asarray(coefficient(cent))
        else:
            kap = np.asarray(coefficient)
        self.coefficient = kap
        # gradient chain rule: grad(phi) = K^T grad_ref(phi), so
        # A_c[i,j] = kappa_c |detJ| (K K^T)_{ab} Shat_ab[i,j]
        G = (kap * np.abs(msh.detJ))[:, None, None] * np.einsum(
            "cax,cbx->cab", K, K
        )
        self.G = jnp.asarray(G)
        self.cell_dofs = jnp.asarray(V.cell_dofs.astype(np.int64))
        self.ndofs = V.ndofs
        self._qpts, self._qw = pts, w
        self._tab = jnp.asarray(V.element.tabulate(pts))  # (nd, nq)
        Shat_diag = jnp.einsum("abii->abi", self.Shat)
        self.diag = (
            jnp.zeros(self.ndofs)
            .at[self.cell_dofs]
            .add(jnp.einsum("cab,abi->ci", self.G, Shat_diag))
        )

    # --- operator ------------------------------------------------------------

    def matvec(self, x):
        xe = x[self.cell_dofs]  # (nc, nd)
        ye = jnp.einsum("cab,abij,cj->ci", self.G, self.Shat, xe)
        return jnp.zeros_like(x).at[self.cell_dofs].add(ye)

    # --- right-hand side -------------------------------------------------------

    def load_vector(self, f_expr, neumann=None):
        """neumann: list of (facets, g) pairs; g is the outward normal flux
        grad(u).n on those facets (demo_reconstruction.py:299-303)."""
        V, msh = self.V, self.V.mesh
        f = as_expr(f_expr, msh)
        vals = f.evaluate(self._qpts)[..., 0]  # (nc, nq)
        adet = jnp.abs(jnp.asarray(msh.detJ))
        be = adet[:, None] * jnp.einsum("q,cq,iq->ci", jnp.asarray(self._qw), vals, self._tab)
        b = jnp.zeros(self.ndofs).at[self.cell_dofs].add(be)
        for facets, g in neumann or []:
            b = b + self._facet_load(facets, g)
        return b

    def _facet_load(self, facets, g_expr):
        """int_F g v ds for boundary facets (g = outward normal flux).

        ``g_expr`` is a callable at physical points, or an array of per-facet
        shifted-Legendre coefficients (nfacets, m) of the trace along the
        canonical facet direction (use ``fem.project_facet_trace``) — the
        latter keeps the primal Neumann load consistent with projected flux
        BCs to machine precision (needed for pure-Neumann equilibration
        patches at flux degree 1).
        """
        V, msh = self.V, self.V.mesh
        facets = np.asarray(facets, dtype=np.int64)
        # generous rule: pure-Neumann equilibration patches need the primal
        # Neumann load and the flux-BC moments to agree to ~machine precision
        s, w = gauss_interval(V.degree + 8)
        pts_e = facet_param_points(s)
        tabs = [jnp.asarray(V.element.tabulate(pts_e[e])) for e in range(3)]
        own = msh.facet_cells[facets, 0].astype(np.int64)
        loc = msh.facet_local[facets, 0].astype(np.int64)
        aligned = msh.edge_aligned[own, loc]
        if isinstance(g_expr, np.ndarray):
            from ..elements.polynomials import legendre_shifted

            coef = g_expr
            leg = legendre_shifted(coef.shape[1] - 1)
            legv = np.array(
                [np.polyval(leg[m, ::-1], s) for m in range(coef.shape[1])]
            )
            gv = jnp.asarray(np.einsum("fm,mq->fq", coef, legv))
        else:
            g = as_expr(g_expr, msh)
            # physical points along the canonical facet direction
            lo = msh.points[msh.facet_vertices[facets, 0]]
            T = msh.facet_tangent[facets]
            xq = lo[:, None, :] + np.einsum("q,fa->fqa", s, T)
            from ..fem.expressions import _CallableExpr  # local import

            if isinstance(g, _CallableExpr):
                gv = jnp.asarray(g.fn(xq))
            else:
                raise NotImplementedError(
                    "Neumann data must be a callable or facet coefficients"
                )
        b = jnp.zeros(self.ndofs)
        wj = jnp.asarray(w)
        for e in range(3):
            for al in (True, False):
                m = (loc == e) & (aligned == al)
                if not m.any():
                    continue
                fsel = facets[m]
                csel = own[m]
                tab = tabs[e]  # (nd, nq) at local param points
                gq = gv[m]  # (nfsel, nq) values at canonical param points
                if not al:
                    # local param runs opposite to canonical: flip q axis of
                    # the basis table (Gauss points are symmetric in [0,1])
                    tab = tab[:, ::-1]
                scale = jnp.asarray(msh.facet_length[fsel])
                be = scale[:, None] * jnp.einsum("q,fq,iq->fi", wj, gq, tab)
                b = b.at[self.cell_dofs[csel]].add(be)
        return b

    # --- Dirichlet + CG solve ---------------------------------------------------

    def solve(
        self,
        f_expr,
        dirichlet_facets,
        u_d,
        neumann=None,
        rtol=1e-12,
        atol=1e-14,
        maxiter=None,
    ) -> Function:
        V, msh = self.V, self.V.mesh
        bdofs = locate_dofs_on_facets(V, dirichlet_facets)
        free = np.ones(self.ndofs, dtype=bool)
        free[bdofs] = False
        free = jnp.asarray(free)

        # boundary values by nodal interpolation of u_d
        from ..fem.interpolate import interpolate

        ud_fun = interpolate(V, u_d)
        x0 = jnp.where(free, 0.0, ud_fun.x)

        b = self.load_vector(f_expr, neumann)
        r0 = jnp.where(free, b - self.matvec(x0), 0.0)
        Minv = jnp.where(self.diag > 0, 1.0 / self.diag, 1.0)

        if maxiter is None:
            maxiter = 20 * int(np.sqrt(self.ndofs) + 100)

        def cg(x0, r0):
            z0 = Minv * r0
            p0 = z0
            rz0 = jnp.dot(r0, z0)
            bnorm = jnp.sqrt(jnp.dot(b * free, b * free)) + atol

            def cond(state):
                _, r, _, _, it = state
                return (jnp.sqrt(jnp.dot(r, r)) > rtol * bnorm + atol) & (
                    it < maxiter
                )

            def body(state):
                x, r, p, rz, it = state
                Ap = jnp.where(free, self.matvec(p), 0.0)
                alpha = rz / jnp.dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = Minv * r
                rz_new = jnp.dot(r, z)
                p = z + (rz_new / rz) * p
                return x, r, p, rz_new, it + 1

            x, r, _, _, it = jax.lax.while_loop(
                cond, body, (x0, r0, p0, rz0, 0)
            )
            return x, r, it

        x, r, it = jax.jit(cg)(x0, r0)
        self.last_iterations = int(it)
        self.last_residual = float(jnp.linalg.norm(r))
        return Function(V, x)
