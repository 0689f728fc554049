"""User-facing flux equilibrators: FluxEqlbEV and FluxEqlbSE.

API mirror of the reference's ``python/dolfinx_eqlb/eqlb/FluxEqlbEV.py`` /
``FluxEqlbSE.py``: construct with (degree, mesh, projected RHS, projected
fluxes), call ``set_boundary_conditions`` then ``equilibrate_fluxes``.

Both strategies produce the unique patch-wise minimiser (see
``eqlb.engine``); they differ in the returned representation:
  * EV returns the equilibrated flux itself in the conforming RT space
    (reference ``FluxEqlbEV.py:178-188``)
  * SE returns the *corrector* in a discontinuous RT space: reconstructed
    flux = corrector + projected flux (reference ``FluxEqlbSE.py:176-186``)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem.spaces import Function, FunctionSpace
from ..fem.interpolate import interpolate
from .bcs import BoundaryData, boundarydata, boundary_function
from .engine import EqlbEngine
from .patches import build_patches

__all__ = ["FluxEquilibrator", "FluxEqlbEV", "FluxEqlbSE"]


def _mesh_patches(mesh):
    if not hasattr(mesh, "_eqlb_patches"):
        mesh._eqlb_patches = build_patches(mesh)
    return mesh._eqlb_patches


def _dg_dofs(f: Function, ndg: int):
    """Dubiner dofs of a (vector) DG function, zero-padded to ndg modes
    (the Dubiner basis is hierarchic, so lower-degree data embeds exactly)."""
    V = f.space
    assert V.family == "DG"
    nd = V.element.ndofs
    nc = V.mesh.num_cells
    x = np.asarray(f.x).reshape(V.block_size, nc, nd)
    if nd < ndg:
        x = np.pad(x, ((0, 0), (0, 0), (0, ndg - nd)))
    elif nd > ndg:
        raise ValueError("projected data degree exceeds flux degree - 1")
    return np.moveaxis(x, 0, 1)  # (nc, vs, ndg)


class FluxEquilibrator:
    """Base: shared setup of the patch tables and the batched engine
    (reference ``eqlb/FluxEquilibrator.py``)."""

    def __init__(self, degree_flux: int, msh, list_rhs, list_proj_flux,
                 pad_quantize: float | None = None):
        """``pad_quantize``: quantize bucket padding so engine shapes recur
        across the meshes of an adaptive loop and recompiles hit the
        persistent compile cache (see EqlbEngine); 1.25 is a good value for
        adaptive runs."""
        if len(list_rhs) != len(list_proj_flux):
            raise RuntimeError("Mismatching inputs!")
        self.degree_flux = degree_flux
        self.mesh = msh
        self.n_fluxes = len(list_rhs)
        k = degree_flux
        ndg = k * (k + 1) // 2
        for f in list_proj_flux:
            if f.space.family != "DG" or f.space.block_size != 2:
                raise ValueError("projected fluxes must be vector DG functions")
        for f in list_rhs:
            if f.space.family != "DG" or f.space.block_size != 1:
                raise ValueError("projected RHS must be scalar DG functions")
        self._V_rt = FunctionSpace(msh, "RT", k)
        self.engine = EqlbEngine(self._V_rt, _mesh_patches(msh),
                                 pad_quantize=pad_quantize)
        self._d_proj = jnp.asarray(
            np.stack([_dg_dofs(f, ndg) for f in list_proj_flux])
        )  # (n_rhs, nc, 2, ndg)
        self._d_rhs = jnp.asarray(
            np.stack([_dg_dofs(f, ndg)[:, 0] for f in list_rhs])
        )  # (n_rhs, nc, ndg)
        self.list_proj_flux = list_proj_flux
        self.list_rhs = list_rhs
        self.boundary_data: BoundaryData | None = None
        self.list_flux: list[Function] = []
        self.list_bfunctions: list[Function] = []

    def set_boundary_conditions(self, list_bfct_prime, list_bcs_flux, quadrature_degree=None):
        if self.n_fluxes != len(list_bfct_prime) or self.n_fluxes != len(list_bcs_flux):
            raise RuntimeError("Mismatching inputs!")
        self.boundary_data = boundarydata(
            list_bcs_flux, self._V_rt, list_bfct_prime, quadrature_degree
        )
        self.list_bfunctions = [
            boundary_function(self.boundary_data, i, self._V_rt)
            for i in range(self.n_fluxes)
        ]

    def _solve(self, weak_symmetry=False, ws_skip_nodes=None):
        if self.boundary_data is None:
            # no BCs set: all boundary facets flux-free
            self.boundary_data = BoundaryData(
                self.mesh, self.degree_flux, self.n_fluxes
            )
        bd = self.boundary_data
        return self.engine.equilibrate(
            self._d_proj,
            self._d_rhs,
            jnp.asarray(bd.facet_kind),
            jnp.asarray(bd.bvals),
            weak_symmetry=weak_symmetry,
            ws_skip_nodes=ws_skip_nodes,
        )  # (n_rhs, ndofs_rt)

    def get_reconstructed_fluxes(self, subproblem: int):
        return self.list_flux[subproblem]


class FluxEqlbEV(FluxEquilibrator):
    """Constrained-minimisation equilibrator (Ern & Vohralik 2015), reference
    ``FluxEqlbEV.py``.  Result: the flux itself, conforming RT."""

    def __init__(self, degree_flux, msh, list_rhs, list_proj_flux,
                 pad_quantize=None):
        super().__init__(degree_flux, msh, list_rhs, list_proj_flux,
                         pad_quantize=pad_quantize)
        self.V_flux = self._V_rt

    def equilibrate_fluxes(self):
        x = self._solve()
        self.list_flux = [
            Function(self.V_flux, x[i]) for i in range(self.n_fluxes)
        ]


class FluxEqlbSE(FluxEquilibrator):
    """Semi-explicit equilibrator (Bertrand et al. 2023), reference
    ``FluxEqlbSE.py``.  Result: the corrector in discontinuous RT, so the
    reconstructed flux is ``corrector + projected flux``."""

    def __init__(
        self,
        degree_flux,
        msh,
        list_rhs,
        list_proj_flux,
        equilibrate_stress: bool = False,
        estimate_korn_constant: bool = False,
        pad_quantize: float | None = None,
    ):
        super().__init__(degree_flux, msh, list_rhs, list_proj_flux,
                         pad_quantize=pad_quantize)
        self.V_flux = FunctionSpace(msh, "DRT", degree_flux)
        self.equilibrate_stress = equilibrate_stress
        self.estimate_korn_constant = estimate_korn_constant
        self.korn_constants = None
        if equilibrate_stress and self.n_fluxes < 2:
            raise ValueError("stress equilibration needs gdim flux rows")

    def _to_corrector(self, x_rt) -> Function:
        """DRT dofs of a conforming RT dof vector: reference functionals are
        sign * global dofs per cell."""
        Vrt, Vd = self._V_rt, self.V_flux
        gath = x_rt[jnp.asarray(Vrt.cell_dofs)] * jnp.asarray(Vrt.dof_signs)
        x = jnp.zeros(Vd.ndofs).at[jnp.asarray(Vd.cell_dofs)].set(gath)
        return Function(Vd, x)

    def equilibrate_fluxes(self):
        if self.equilibrate_stress and self.degree_flux < 2:
            # reference se/reconstruction.hpp:357-388 enforces the same
            raise ValueError("stress equilibration requires flux degree >= 2")
        groups, skip = [], None
        if self.equilibrate_stress and self.degree_flux == 2 and self.boundary_data is not None:
            # deficient pure-traction boundary patches are merged with an
            # adjacent interior patch and corrected jointly (reference
            # se/reconstruction.hpp:166-234 patch grouping); only truly
            # ungroupable meshes raise (eqlb.grouping.build_groups)
            from .grouping import build_groups

            groups, skip = build_groups(
                self.engine, self.boundary_data.facet_kind[:2]
            )
        x = self._solve(weak_symmetry=self.equilibrate_stress,
                        ws_skip_nodes=skip)
        if groups:
            from .grouping import grouped_weak_symmetry

            x01 = grouped_weak_symmetry(
                self.engine, x[:2], self.boundary_data.facet_kind[:2], groups
            )
            x = x.at[:2].set(x01)
        self.list_flux = []
        for i in range(self.n_fluxes):
            sig_r = self._to_corrector(x[i])
            proj_d = interpolate(self.V_flux, self.list_proj_flux[i])
            self.list_flux.append(
                Function(self.V_flux, sig_r.x - proj_d.x)
            )
        if self.estimate_korn_constant:
            from .korn import estimate_korn_constants

            self.korn_constants = estimate_korn_constants(self.mesh)

    def get_korn_constants(self):
        if self.korn_constants is None:
            raise RuntimeError("Korn constants are not estimated!")
        return self.korn_constants
