"""Mesh topology / generator / refinement tests."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import (
    TriMesh,
    unit_square,
    lshape,
    cook_membrane,
    permute_vertices,
    refine_uniform,
    refine_marked,
)


def _check_invariants(msh: TriMesh):
    # facet <-> cell tables consistent
    for f in range(msh.num_facets):
        for s in range(2):
            c = msh.facet_cells[f, s]
            if c < 0:
                continue
            li = msh.facet_local[f, s]
            assert msh.cell_facets[c, li] == f
    # every interior facet has 2 cells, boundary 1
    assert (msh.facet_cells[:, 0] >= 0).all()
    # vertex->cell CSR
    for v in [0, msh.num_vertices // 2, msh.num_vertices - 1]:
        cells = msh.vertex_cells(v)
        mask = (msh.cells == v).any(axis=1)
        assert set(cells.tolist()) == set(np.where(mask)[0].tolist())
    # areas positive and consistent
    assert (msh.cell_volumes > 0).all()


def test_unit_square_crossed():
    msh = unit_square(4)
    assert msh.num_cells == 4 * 16
    _check_invariants(msh)
    assert np.isclose(msh.cell_volumes.sum(), 1.0)
    # Euler: V - E + F = 1 for a disc
    assert msh.num_vertices - msh.num_facets + msh.num_cells == 1


@pytest.mark.parametrize("diag", ["left", "right"])
def test_unit_square_diag(diag):
    msh = unit_square(3, diagonal=diag)
    assert msh.num_cells == 18
    _check_invariants(msh)
    assert np.isclose(msh.cell_volumes.sum(), 1.0)


def test_permuted_has_reversed_edges():
    """The fixture property asserted by the reference's gmsh mesh factory
    (test/unit/utils.py:136-139): orientation machinery must be exercised."""
    msh = permute_vertices(unit_square(4), seed=3)
    _check_invariants(msh)
    assert np.isclose(msh.cell_volumes.sum(), 1.0)
    # some interior facet is anti-aligned in one of its cells
    f = ~msh.is_boundary_facet
    a0 = msh.edge_aligned[msh.facet_cells[f, 0], msh.facet_local[f, 0]]
    a1 = msh.edge_aligned[msh.facet_cells[f, 1], msh.facet_local[f, 1]]
    assert (a0 != a1).any()
    # and some cell has negative detJ
    assert (msh.detJ < 0).any()


def test_lshape_cook():
    msh = lshape(4)
    _check_invariants(msh)
    assert np.isclose(msh.cell_volumes.sum(), 3.0)
    msh = cook_membrane(4, 4)
    _check_invariants(msh)
    assert np.isclose(msh.cell_volumes.sum(), 48.0 * (44.0 + 16.0 / 2.0) / 1.0 - 48 * 44 / 2)


def test_refine_uniform():
    msh = unit_square(2)
    r = refine_uniform(msh)
    assert r.num_cells == 4 * msh.num_cells
    _check_invariants(r)
    assert np.isclose(r.cell_volumes.sum(), 1.0)


def test_refine_marked_conforming():
    msh = unit_square(3)
    rng = np.random.default_rng(0)
    for _ in range(4):
        marked = rng.choice(msh.num_cells, size=max(1, msh.num_cells // 5), replace=False)
        msh = refine_marked(msh, marked)
        _check_invariants(msh)
        assert np.isclose(msh.cell_volumes.sum(), 1.0)
    # quality does not degenerate
    q = msh.cell_volumes / msh.h_cell**2
    assert q.min() > 0.05


def test_refine_marked_deep_corner():
    """Deep bisection at a corner singularity reaches tiny cells (h ~ 1e-8,
    detJ ~ h^2 ~ 1e-16) that are perfectly healthy — the degeneracy guard
    must be relative to the cell scale, and the longest-edge tie-break must
    stay relative so quality is preserved at depth (regression: the adaptive
    L-shape demo crashed at iteration 49 with 'degenerate cell in mesh')."""
    msh = lshape(2)
    corner = np.array([0.0, 0.0])
    for _ in range(60):
        # mark the cells touching the re-entrant corner, as Doerfler marking
        # of the singular solution would
        d = np.linalg.norm(msh.points[msh.cells].mean(axis=1) - corner, axis=-1)
        marked = np.where(d <= d.min() * (1 + 1e-9))[0]
        msh = refine_marked(msh, marked)
    q = msh.cell_volumes / msh.h_cell**2
    assert msh.h_cell.min() < 1e-8
    assert q.min() > 0.05  # bisection keeps similarity classes bounded
    assert np.isclose(msh.cell_volumes.sum(), 3.0)


def test_boundary_outward_sign():
    msh = permute_vertices(unit_square(3), seed=1)
    for f in msh.boundary_facets:
        mid = msh.points[msh.facet_vertices[f]].mean(axis=0)
        t = msh.facet_tangent[f]
        n = np.array([t[1], -t[0]]) * msh.boundary_outward_sign[f]
        # stepping outward from the midpoint leaves the unit square
        p = mid + 1e-3 * n / np.linalg.norm(n)
        assert not (0 <= p[0] <= 1 and 0 <= p[1] <= 1)
