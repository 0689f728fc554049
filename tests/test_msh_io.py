"""Gmsh .msh import: v2.2 and v4.1 ASCII, physical tags, and an
end-to-end equilibration on the imported mesh (reference demos build their
meshes via the gmsh API — demo_reconstruction.py:125-160)."""

import numpy as np

from dolfinx_eqlb_tpu.eqlb import FluxEqlbSE, check_divergence_condition
from dolfinx_eqlb_tpu.fem import FunctionSpace, local_projection
from dolfinx_eqlb_tpu.mesh.msh_io import read_msh

# unit square, 4 triangles around the center, v2.2: boundary lines tagged
# 10 (left) / 20 (rest)
MSH_V2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 0.5 0.5 0
$EndNodes
$Elements
8
1 1 2 10 1 4 1
2 1 2 20 2 1 2
3 1 2 20 3 2 3
4 1 2 20 4 3 4
5 2 2 1 1 1 2 5
6 2 2 1 1 2 3 5
7 2 2 1 1 3 4 5
8 2 2 1 1 4 1 5
$EndElements
"""

MSH_V4 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
2 5 1 5
1 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
2 1 0 1
5
0.5 0.5 0
$EndNodes
$Elements
3 8 1 8
1 10 1 1
1 4 1
1 20 1 3
2 1 2
3 2 3
4 3 4
2 1 2 4
5 1 2 5
6 2 3 5
7 3 4 5
8 4 1 5
$EndElements
"""


def _check(msh, facet_tags):
    assert msh.num_cells == 4
    assert msh.num_vertices == 5
    assert len(facet_tags[10]) == 1
    assert len(facet_tags[20]) == 3
    # tag 10 is the left edge x = 0
    fv = msh.facet_vertices[facet_tags[10][0]]
    assert np.allclose(msh.points[fv][:, 0], 0.0)
    # every tagged facet is a boundary facet
    allb = np.concatenate([facet_tags[10], facet_tags[20]])
    assert set(allb) == set(msh.boundary_facets.tolist())


def test_read_msh_v2():
    msh, ft, ct = read_msh(MSH_V2)
    _check(msh, ft)
    assert len(ct[1]) == 4


def test_read_msh_v4():
    msh, ft, ct = read_msh(MSH_V4)
    _check(msh, ft)


def test_equilibrate_on_imported_mesh():
    msh, ft, _ = read_msh(MSH_V2)
    k = 2
    Vr = FunctionSpace(msh, "DG", k - 1)
    Vf = FunctionSpace(msh, "DG", k - 1, vs=2)
    rhs = local_projection(Vr, [lambda x: np.ones(x.shape[:-1])])
    from dolfinx_eqlb_tpu.fem import expr_from_callable

    # div sigma = f (hat-compatible data, like the reference's projected
    # Galerkin fluxes)
    proj = local_projection(
        Vf, [expr_from_callable(
            lambda x: 0.5 * np.stack([x[..., 0], x[..., 1]], -1), msh,
            value_size=2)],
    )
    eq = FluxEqlbSE(k, msh, rhs, proj)
    eq.set_boundary_conditions([msh.boundary_facets], [[]])
    eq.equilibrate_fluxes()
    assert check_divergence_condition(eq.list_flux[0], proj[0], rhs[0])
