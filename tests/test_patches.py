"""Vectorized patch builder vs per-vertex reference walk."""

import numpy as np
import pytest

from dolfinx_eqlb_tpu.mesh import unit_square, lshape, permute_vertices
from dolfinx_eqlb_tpu.eqlb.patches import build_patches, build_patches_reference


@pytest.mark.parametrize("mesh_fn", [
    lambda: unit_square(5),
    lambda: permute_vertices(unit_square(5), seed=9),
    lambda: lshape(3),
])
def test_vectorized_matches_reference(mesh_fn):
    msh = mesh_fn()
    fast = build_patches(msh)
    ref = build_patches_reference(msh)
    assert set(fast.keys()) == set(ref.keys())
    for key in ref:
        bf, br = fast[key], ref[key]
        # same set of vertices per bucket
        assert set(bf.nodes.tolist()) == set(br.nodes.tolist())
        # align rows by vertex id
        of = np.argsort(bf.nodes)
        orf = np.argsort(br.nodes)
        # per-patch cell sets agree
        cf = np.sort(bf.cells[of], axis=1)
        cr = np.sort(br.cells[orf], axis=1)
        assert (cf == cr).all()
        sf = np.sort(bf.spokes[of], axis=1)
        sr = np.sort(br.spokes[orf], axis=1)
        assert (sf == sr).all()
        if key[1]:  # boundary: walk is direction-forced -> exact equality
            for name in ("cells", "lnode", "spokes", "entry_loc", "exit_loc"):
                assert (getattr(bf, name)[of] == getattr(br, name)[orf]).all(), name
        # structural validity: cell i sits between spoke i and spoke i+1
        msh_cf = msh.cell_facets
        n, ns = bf.ncells, bf.nspokes
        for p in range(min(5, bf.npatches)):
            for i in range(n):
                c = bf.cells[p, i]
                assert msh_cf[c, bf.entry_loc[p, i]] == bf.spokes[p, i]
                assert msh_cf[c, bf.exit_loc[p, i]] == bf.spokes[p, (i + 1) % ns]
                assert msh.cells[c, bf.lnode[p, i]] == bf.nodes[p]
