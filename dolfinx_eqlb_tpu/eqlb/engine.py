"""Batched patch-wise constrained minimisation — the equilibration core.

Both reference equilibrators solve, for every mesh vertex z with hat
function psi_z, the same local problem on the patch omega_z (cf.
``ev/solve_patch.hpp`` and ``se/solve_patch_semiexplt.hpp``):

    minimise || sigma_z - psi_z sigma_proj ||_{L2(omega_z)}
    s.t.   (div sigma_z, q) = (psi_z f + grad(psi_z).sigma_proj, q)
                                          for all q in DG_{k-1}(omega_z)
           sigma_z . n = 0            on the outer ring of the patch
           sigma_z . n = psi_z g      on flux-essential boundary spokes
           sigma_z . n free           on primal-Dirichlet boundary spokes

(the EV mixed form, reference ``FluxEqlbEV.py:116-134``; the SE two-step
scheme computes the identical minimiser of the identical constraint set, so
one engine serves both).  The sum sigma_R = sum_z sigma_z satisfies
div(sigma_R) = P_{k-1} f and the prescribed normal traces exactly.

TPU design: one dense KKT system per patch
    [ M  -B^T  0 ] [sigma]   [F_v]
    [ B   0    c ] [  r  ] = [F_q]
    [ 0   c^T  0 ] [ lam ]   [ 0 ]
with the mean-value Lagrange multiplier ``lam`` active on interior /
pure-Neumann patches (the reference's penalty row, ``ev/assembly.hpp:280-305``
and ``se/PatchData.hpp:168-223``).  Element tensors are contractions of
constant reference tensors with per-cell geometry; patches are bucketed so
assembly is static block placement and the solve one batched LU per bucket.
Essential dofs stay in the system as identity rows (row replacement, like the
reference's BC rows ``ev/assembly.hpp:252-266``).

The whole equilibration (every bucket: assembly, batched LU, optional weak
symmetry, global scatter-add) is ONE jitted XLA program.  All index tables
and reference tensors are passed into the jit as *device arguments*, never
as baked constants — the TPU backend here constant-folds gathers over
constant operands incorrectly, and argument-passing also keeps the compiled
executable reusable across meshes of identical bucket structure.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..elements.lagrange import dubiner_cached, lagrange_cached
from ..elements.polynomials import legendre_shifted
from ..elements.quadrature import gauss_interval, gauss_triangle
from ..elements.rt import rt_cached
from ..fem.spaces import FunctionSpace
from .patches import PatchBucket, bucket_dof_tables

__all__ = ["EqlbEngine", "reference_tensors"]

# fuse=False per-bucket executables, shared ACROSS engines so adaptive
# loops (fresh engine per refined mesh) reuse compiled bucket programs —
# see EqlbEngine._equilibrate_unfused
_UNFUSED_JIT_CACHE: dict = {}


_HAT_GRADS = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])


def _quantize_pad(target: int, f: float) -> int:
    """Next size on the geometric padding grid: powers of two below 128,
    tile-aligned ~f-ratio steps above (see EqlbEngine pad_quantize).  The
    grid is a fixed sequence independent of the query, so adaptive meshes
    land on recurring sizes."""
    if target <= 1:
        return 1
    if target < 128:
        return 1 << (target - 1).bit_length()
    size = 128
    while size < target:
        size = max(size + 128, -(-int(size * f) // 128) * 128)
    return size


@lru_cache(maxsize=None)
def reference_tensors(k: int):
    """Constant reference-cell tensors for RT_k / DG_{k-1} / P1-hat."""
    rt = rt_cached(k)
    dub = dubiner_cached(k - 1)
    hat = lagrange_cached(1)
    pts, w = gauss_triangle(2 * k + 2)
    phi = rt.tabulate(pts)  # (nrt, 2, nq)
    dphi = rt.tabulate_div(pts)  # (nrt, nq)
    q = dub.tabulate(pts)  # (ndg, nq)
    lam = hat.tabulate(pts)  # (3, nq)

    Mhat = np.einsum("x,iax,jbx->abij", w, phi, phi)
    Dhat = np.einsum("x,ix,px->ip", w, dphi, q)
    Rhat = np.einsum("x,lx,mx,iax->lmai", w, lam, q, phi)
    Rlam = np.einsum("x,lx,iax->lai", w, lam, phi)  # weak-symmetry coupling
    T3 = np.einsum("x,lx,mx,px->lmp", w, lam, q, q)
    cpen = np.einsum("x,px->p", w, q)  # only the constant mode is nonzero

    # hat-weighted Legendre products on [0,1] for boundary-spoke dofs:
    # W[end, j, m] = int lin_end(s) P~_j(s) P~_m(s) ds, lin_0 = 1-s, lin_1 = s
    s, ws = gauss_interval(k + 2)
    leg = legendre_shifted(k - 1)
    legv = np.array([np.polyval(leg[m, ::-1], s) for m in range(k)])
    Wend = np.stack(
        [
            np.einsum("x,jx,mx->jm", ws * (1.0 - s), legv, legv),
            np.einsum("x,jx,mx->jm", ws * s, legv, legv),
        ]
    )
    return dict(
        Mhat=Mhat, Dhat=Dhat, Rhat=Rhat, Rlam=Rlam, T3=T3, cpen=cpen, Wend=Wend
    )


class EqlbEngine:
    """Per-mesh, per-degree batched equilibration engine."""

    def __init__(
        self,
        V_flux: FunctionSpace,
        buckets: dict[tuple, PatchBucket],
        dtype=None,
        pad_to_multiple: int | None = None,
        max_patches_per_bucket: int | None = None,
        pad_quantize: float | None = None,
    ):
        """``dtype``: compute precision of the batched patch solves.  f64 is
        the default (the 1e-10-level invariant checks need it) but the TPU
        backend only implements batched LU in f32 — pass jnp.float32 there
        (bench.py does).

        ``pad_to_multiple``: pad every bucket's patch axis to a multiple of
        this (for even sharding across a device mesh).  Pad entries repeat
        the last patch but scatter to out-of-bounds global dofs, which XLA
        drops — so padding never perturbs the result.

        ``max_patches_per_bucket``: split large buckets into chunks of at
        most this many patches — bounds the peak HBM of the batched LU temp
        (a 249k x 57 x 57 f32 LU pads to 7.6 GB on TPU).

        ``pad_quantize``: round every bucket's padded patch count up to a
        geometric grid (next power of two below 128 patches, then
        128 * ceil(f^j) with f = pad_quantize).  Bucket shapes then RECUR
        across the meshes of an adaptive refinement loop, so recompiles hit
        the persistent compile cache (all tables enter the jit as
        arguments, so equal shapes mean equal HLO).  Costs at most a factor
        f of padded compute; 1.25 is a good default for adaptive runs.
        """
        assert V_flux.family == "RT"
        self.V = V_flux
        self.k = V_flux.degree
        self.mesh = V_flux.mesh
        # "pallas": on-chip pivot-free LU (ops.patch_solve) — ~1000x less
        # HBM traffic than XLA's LuDecomposition custom call; "xla": batched
        # jnp.linalg.solve (robust default for f64 CPU testing)
        self.solver = "xla"
        # f64 residual-correction passes of the "pallas_mixed" solver; the
        # cached bucket inverses are built through it, so extra steps cost
        # table-build time only (not steady state)
        self.mixed_refine_steps = int(os.environ.get("EQLB_MIXED_REFINE", 1))
        # every bucket's patch axis ends in >= LANE_PAD pad lanes: under
        # whole-program fusion pressure this backend sporadically poisons
        # the LAST (8, 128) lane tile of a large bucket pipeline with NaN
        # (observed at X = 131072: exactly lanes 130944-131071; the isolated
        # program is bit-clean).  With a full pad tile at the end the
        # poisoned lanes are never read back (pad entries scatter to
        # out-of-bounds dofs / are excluded from the combine tables).
        LANE_PAD = 128
        self._chunk_target = {}
        if max_patches_per_bucket:
            from dataclasses import replace

            C = max_patches_per_bucket
            stride = C - LANE_PAD  # real patches per chunk; C incl. pad
            split = {}
            for key, b in buckets.items():
                P = b.npatches
                if P + LANE_PAD <= C:
                    split[key] = b
                    continue
                nchunks = -(-P // stride)
                for i in range(nchunks):
                    s = slice(i * stride, min((i + 1) * stride, P))
                    split[key + (i,)] = replace(
                        b,
                        nodes=b.nodes[s],
                        cells=b.cells[s],
                        lnode=b.lnode[s],
                        spokes=b.spokes[s],
                        entry_loc=b.entry_loc[s],
                        exit_loc=b.exit_loc[s],
                    )
                    # equal chunk sizes share one compiled executable; every
                    # chunk is padded up to C (pads scatter out of bounds)
                    self._chunk_target[key + (i,)] = C
            buckets = split
        self.buckets = buckets
        self.dtype = dtype or jnp.float64
        # "semiexplicit": explicit divergence step + reduced H(div=0) SPD
        # solve (the fast path, dimension 1 + ns(k-1) + n(k-1)(k-2)/2);
        # "kkt": full per-patch saddle-point system (reference path for
        # cross-checking, dimension nflux + n*ndg)
        self.mode = "semiexplicit"
        self.ref = reference_tensors(self.k)
        self.se_static = {}
        self.tables = {}
        msh = self.mesh
        from .semiexplicit import se_host_tables, se_static

        # gather per-patch geometry at the compute precision (halves the
        # host table-build memory traffic for f32 engines)
        np_dt = np.dtype(self.dtype)
        J_g = np.ascontiguousarray(msh.J, dtype=np_dt)
        K_g = np.ascontiguousarray(msh.K, dtype=np_dt)
        detJ_g = np.ascontiguousarray(msh.detJ, dtype=np_dt)
        for key, b in buckets.items():
            t = bucket_dof_tables(b, V_flux)
            self.se_static[key] = se_static(b, self.k)
            t.update(se_host_tables(b, t, msh, self.k))
            cells64 = b.cells.astype(np.int64)
            t["J"] = J_g[cells64]  # (P, n, 2, 2)
            t["detJ"] = detJ_g[cells64]
            t["K"] = K_g[cells64]
            # endpoint of each boundary spoke: is z the lower-global-id end?
            if b.is_boundary:
                fv = msh.facet_vertices[b.spokes[:, [0, -1]].astype(np.int64)]
                t["z_is_lo"] = fv[..., 0] == b.nodes[:, None]  # (P, 2)
                t["bspokes"] = b.spokes[:, [0, -1]].astype(np.int64)  # (P, 2)
            # unchunked buckets: tile-align and append the safety pad tile
            # (tiny buckets stay exact — their whole extent is one tile)
            target = self._chunk_target.get(
                key,
                b.npatches if b.npatches < 128
                else -(-(b.npatches + 128) // 128) * 128,
            )
            if pad_to_multiple:
                target += (-target) % pad_to_multiple
            if pad_quantize and key not in self._chunk_target:
                target = _quantize_pad(target, pad_quantize)
                if pad_to_multiple:
                    target += (-target) % pad_to_multiple
            if target > b.npatches:
                P = b.npatches
                pad = target - P
                if pad:
                    per_patch = ["perm", "signs", "gdofs", "lv_hats", "J",
                                 "detJ", "K", "z_is_lo", "bspokes", "cells",
                                 "lnode", "gamma", "cumalpha", "combo"]
                    t["cells"] = b.cells
                    t["lnode"] = b.lnode
                    for name in per_patch:
                        if name in t:
                            arr = t[name]
                            t[name] = np.concatenate(
                                [arr, np.repeat(arr[-1:], pad, axis=0)]
                            )
                    # pad rows scatter out of bounds -> dropped by XLA
                    t["gdofs"][P:] = self.V.ndofs
                t["n_valid"] = P
            self.tables[key] = t

        # --- combine tables: gather-based global accumulation ----------------
        # TPU scatter-add serializes colliding updates (measured 17 ms for a
        # 1.4M-element scatter at 160k cells); every global dof has at most 3
        # contributors (2 patches per facet dof, 3 per cell dof), so the
        # semi-explicit path instead gathers from the concatenated flat
        # (nflux-major) bucket solutions
        ndofs = self.V.ndofs
        total = sum(
            int(np.prod(self.tables[key]["gdofs"].shape))
            for key in self.tables
        )
        from .. import native

        src = np.full((ndofs, 3), total, dtype=np.int32)  # total = pad slot
        cur = np.zeros(ndofs, dtype=np.uint8)
        use_native = native.available()
        off = 0
        self._flat_offsets = {}
        for key in sorted(self.tables.keys()):
            g = self.tables[key]["gdofs"]  # (Ppad, nflux)
            Ppad, nflux = g.shape
            self._flat_offsets[key] = off
            if use_native:
                native.combine_fill(ndofs, off, g, src, cur)
            else:
                pp, ff = np.nonzero((g >= 0) & (g < ndofs))
                gd = g[pp, ff].astype(np.int64)
                idx = off + ff * Ppad + pp
                # stable (p, f)-order column assignment per dof
                order = np.argsort(gd, kind="stable")
                sg, si = gd[order], idx[order]
                poscol = (
                    np.arange(len(sg))
                    - np.searchsorted(sg, sg, side="left")
                    + cur[sg]
                )
                if len(poscol) and poscol.max() > 2:
                    raise RuntimeError(
                        "dof with more than 3 patch contributions")
                src[sg, poscol] = si
                np.add.at(cur, gd, 1)
            off += Ppad * nflux
        self._flat_len = off
        # gather-by-128-row layout: fetch full 128-lane rows (bandwidth-bound
        # XLA gather), select lanes in a Pallas epilogue (ops.lane_select).
        # The TPU gather is INDEX-RATE-bound (~100-200M idx/s, measured
        # locality-independent), so for n_rhs > 1 the combine switches to a
        # batched element gather on (n_rhs, L): one index fetches the column
        # for every RHS at the same per-index cost as one (measured: a
        # (3, 12M)[:, 10M-idx] gather costs the same 107 ms as 1-RHS)
        nfk = self.V.mesh.num_facets * self.k
        assert np.all(src[:nfk, 2] == total), "facet dof with 3 contributors"
        self._combine = dict(
            Lpad=self._lpad(), nfk=nfk,
            src01=src[:, :2].copy(), src2=src[nfk:, 2:].copy(), total=total,
        )
        # even k: patch-major PAIR tables halve the gather index count (the
        # TPU gather is index-rate-bound) — one fetched row serves both dofs
        # of a facet/cell pair.  Falls back to the flux-major per-dof layout
        # when the structural preconditions don't hold (odd k, exotic meshes)
        self._patch_major = (
            self.k % 2 == 0
            and not os.environ.get("EQLB_NO_PAIRED_COMBINE")
            and self._build_paired_tables()
        )
        if not self._patch_major:
            cm = self._combine
            cm["rows01"], cm["lane01"] = self._shaped_tables(src[:, :2])
            cm["rows2"], cm["lane2"] = self._shaped_tables(src[nfk:, 2:])

        self._dev = None
        self._ref_dev = None
        self._jit_eq = None
        self._have_elem_combine = False
        self._packed_R = set()

    def _lpad(self, R: int = 1) -> int:
        """Padded flat-position count of the R-packed layout: positions per
        128-lane row is W = 128 // R; the pad slot (index ``total``) must be
        addressable (and read zero)."""
        W = 128 // R
        return -(-(self._flat_len + 1) // W) * W

    def _shaped_tables(self, s, R: int = 1):
        """(rows_flat, lane) combine index tables for the R-packed flat
        layout: flat element of (position p, rhs r) lives at row p // W,
        lane (p % W) * R + r with W = 128 // R."""
        W = 128 // R
        from .. import native

        out = native.shaped_tables(np.ascontiguousarray(s, np.int32), W, R)
        if out is not None:
            return out
        M, C = s.shape
        pad = (-M) % 1024
        s = np.pad(s, ((0, pad), (0, 0)))  # pads read row 0, sliced away
        lane = ((s % W) * R).reshape(-1, 8, 128, C)
        return (
            (s // W).reshape(-1).astype(np.int32),  # pre-flattened
            np.ascontiguousarray(np.moveaxis(lane, 3, 1)).astype(np.int32),
        )

    def _build_paired_tables(self) -> bool:
        """Patch-major pair tables for the combine (even k only).

        In a PATCH-MAJOR flat layout (position = off + p * nflux + f) a
        patch's flux dofs are contiguous, so the k dofs of one facet — and
        the k(k-1) interior dofs of one cell — occupy consecutive positions.
        Global dofs are facet-major (d = facet * k + j) and cell-major, so
        output dofs ALSO come in adjacent pairs whose contributor positions
        are adjacent: one gathered 128-lane row serves BOTH dofs of a pair
        via the lane-select kernel's +1 offset read (lane_select_multi).
        This halves the gather index count, which is what the TPU gather's
        throughput is bound by (~220M idx/s, measured locality-independent).

        Evenness of k makes every run (k per facet, k(k-1) per cell) and
        every block offset even, so pairs never straddle a 128-lane row.
        Contributor columns are ordered by GLOBAL PATCH ID (pair-invariant,
        unlike the flux-major (p, f) insertion order), so both dofs of a
        pair see the same patch in the same column.  Returns False — leaving
        the flux-major per-dof layout active — if any precondition fails;
        every condition is re-checked against the actual tables."""
        ndofs = self.V.ndofs
        nfk = self._combine["nfk"]
        if ndofs % 2 or nfk % 2:
            return False
        gd_l, pos_l, pid_l = [], [], []
        offP = 0
        base = 0
        flatP_off = {}
        for key in sorted(self.tables.keys()):
            g = self.tables[key]["gdofs"]
            Ppad, nflux = g.shape
            if nflux % 2 or offP % 2:
                return False
            flatP_off[key] = offP
            pp, ff = np.nonzero((g >= 0) & (g < ndofs))
            gd_l.append(g[pp, ff].astype(np.int64))
            pos_l.append(offP + pp.astype(np.int64) * nflux + ff)
            pid_l.append(base + pp.astype(np.int64))
            offP += Ppad * nflux
            base += Ppad
        gd = np.concatenate(gd_l)
        pos = np.concatenate(pos_l)
        pid = np.concatenate(pid_l)
        order = np.lexsort((pid, gd))
        gd, pos = gd[order], pos[order]
        col = np.arange(len(gd)) - np.searchsorted(gd, gd, side="left")
        if len(col) and col.max() > 2:
            return False
        srcP = np.full((ndofs, 3), -1, np.int64)
        srcP[gd, col] = pos
        if ((srcP[:, :2] < 0).any() or (srcP[nfk:, 2] < 0).any()
                or (srcP[:nfk, 2] >= 0).any()):
            return False
        ev, od = srcP[0::2], srcP[1::2]
        if (ev[:, :2] % 2).any() or (od[:, :2] != ev[:, :2] + 1).any():
            return False
        c2e, c2o = srcP[nfk::2, 2], srcP[nfk + 1:: 2, 2]
        if (c2e % 2).any() or (c2o != c2e + 1).any():
            return False
        cm = self._combine
        # elem-gather combine reads the full per-dof tables (now in
        # patch-major positions); the row-gather paths read the halved
        # PAIR tables (base position of each 2-run)
        cm["src01"] = srcP[:, :2].astype(np.int32)
        cm["src2"] = srcP[nfk:, 2:3].astype(np.int32)
        cm["pair01"] = np.ascontiguousarray(ev[:, :2]).astype(np.int32)
        cm["pair2"] = np.ascontiguousarray(c2e[:, None]).astype(np.int32)
        cm["rows01"], cm["lane01"] = self._shaped_tables(cm["pair01"])
        cm["rows2"], cm["lane2"] = self._shaped_tables(cm["pair2"])
        self._flatP_offsets = flatP_off
        return True

    def _use_elem_combine(self, n_rhs: int) -> bool:
        """The batched element-gather combine is used for f64 engines on
        TPU (Mosaic kernels are f32-only) and for EVERYTHING off-TPU: the
        row-gather path's Pallas lane select only runs in interpret mode
        there and dominates CPU wall-clock ~50x (the elem path is pure
        XLA).  EQLB_FORCE_LANE_SELECT=1 restores the row+kernel path
        off-TPU for interpret-mode kernel coverage in tests."""
        import os

        if self._use_ds_combine(n_rhs):
            return False
        if jax.default_backend() != "tpu":
            return "EQLB_FORCE_LANE_SELECT" not in os.environ
        return self.dtype == jnp.float64

    def _use_ds_combine(self, n_rhs: int) -> bool:
        """Double-single combine for f64 data: the flat solution rides the
        index-rate-bound row gather as (hi, lo) f32 lane-plane pairs — the
        R = 2 lane-packed PAIRED tables, i.e. the 1-field f32 index count —
        and is reconstructed in f64 afterwards (exact to ~2^-48: the
        contributor sum is 2Sum-compensated in the select kernel,
        ops.lane_select_ds).  Replaces the emulated-f64 element gather on
        TPU, the dominant cost of the mixed-precision path
        (BENCH_MIXED_r04: 519.9 ms vs 80.7 ms f32)."""
        import os

        return (
            n_rhs == 1
            and self.dtype == jnp.float64
            and self._patch_major
            and not os.environ.get("EQLB_NO_DS_COMBINE")
            and (jax.default_backend() == "tpu"
                 or "EQLB_FORCE_LANE_SELECT" in os.environ)
        )

    # Largest lane-packed combine source (R x padded flat f32) that still
    # rides the TPU gather's fast regime: row-fetch throughput drops ~3x
    # once the source outgrows the chip's ~128 MB last-level cache
    # (PROFILE_COMBINE_STRATEGIES.json at 1M cells: one R = 3 pass with a
    # 146 MB source takes 180 ms where 3 cache-resident per-field passes
    # take 125 ms and R2 + R1 132 ms).
    _pack_src_bytes_max = 120e6

    def _pack_groups(self, n_rhs: int):
        """Sizes of the successive lane-packed passes serving n_rhs fields
        (in field order; 1 = plain per-field paired pass).

        A single R = n_rhs pass needs only the 1-field index count — one
        gathered row serves 2 dofs x R RHS — but its packed source is R x
        the field size.  Past the cache cliff (_pack_src_bytes_max) the
        row fetches slow ~3x, so the plan greedily takes the largest pack
        whose source stays cache-resident.  Exception at rem == 3: three
        per-field passes measured faster than R2 + R1 (consecutive passes
        over the SAME index tables keep them cache-warm)."""
        if n_rhs <= 1:
            return [1] * n_rhs
        itemsize = np.dtype(np.float32).itemsize  # packed path is f32-only

        def fits(R):
            # actual packed-source footprint: non-divisor R (e.g. 3) pads
            # every W-position row out to 128 lanes (_packed_combine), so
            # size from the real row count, not R * Lpad
            rows = self._lpad(R) // (128 // R)
            return rows * 128 * itemsize <= self._pack_src_bytes_max

        groups = []
        rem = n_rhs
        while rem >= 2:
            R = max((g for g in (4, 3, 2) if g <= rem and fits(g)),
                    default=0)
            if R == 0 or (rem == 3 and R == 2):
                break
            groups.append(R)
            rem -= R
        groups.extend([1] * rem)
        return groups

    def _pack_plan(self, n_rhs: int):
        """R values of the lane-packed row-gather passes serving n_rhs
        fields (mirrors the _combine_flat dispatch)."""
        if n_rhs < 2 or self._use_elem_combine(n_rhs):
            return []
        if not self._patch_major:
            return [2]
        return sorted({g for g in self._pack_groups(n_rhs) if g >= 2})

    def _ensure_combine_tables(self, n_rhs: int):
        """Upload the extra combine index tables the n_rhs > 1 paths need
        (lazy).  n_rhs >= 2 routes through lane-packed row gathers sized
        by _pack_groups (cache-resident packs, pairwise R=2 when
        unpaired); f64 / off-TPU use the element gather."""
        elem = self._use_elem_combine(n_rhs)
        # the double-single f64 path rides the R = 2 pair tables; it serves
        # n_rhs == 1 directly and any 1-field slice the multi-field pack
        # plan recurses into
        needs_ds = self._use_ds_combine(1) and (
            n_rhs == 1
            or (not elem and self._patch_major
                and 1 in self._pack_groups(n_rhs))
        )
        if needs_ds and 2 not in self._packed_R:
            _, refd = self._device_tables()
            cm = self._combine
            for nm in ("01", "2"):
                rows, lane = self._shaped_tables(cm["pair" + nm], 2)
                refd[f"rows{nm}R2"] = jnp.asarray(rows, jnp.int32)
                refd[f"lane{nm}R2"] = jnp.asarray(lane, jnp.int32)
            self._packed_R.add(2)
        if n_rhs <= 1 and not elem:
            return
        _, refd = self._device_tables()
        cm = self._combine
        if not elem and n_rhs >= 2:
            src_nm = "pair" if self._patch_major else "src"
            for R in self._pack_plan(n_rhs):
                if R in self._packed_R:
                    continue
                for nm in ("01", "2"):
                    rows, lane = self._shaped_tables(cm[src_nm + nm], R)
                    refd[f"rows{nm}R{R}"] = jnp.asarray(rows, jnp.int32)
                    refd[f"lane{nm}R{R}"] = jnp.asarray(lane, jnp.int32)
                self._packed_R.add(R)
            return
        if self._have_elem_combine:
            return
        refd["elem_c0"] = jnp.asarray(cm["src01"][:, 0], jnp.int32)
        refd["elem_c1"] = jnp.asarray(cm["src01"][:, 1], jnp.int32)
        refd["elem_c2"] = jnp.asarray(cm["src2"][:, 0], jnp.int32)
        self._have_elem_combine = True

    # --- device-resident tables (passed as jit *arguments*) -----------------

    def _device_tables(self):
        if self._dev is not None:
            return self._dev, self._ref_dev
        dt = self.dtype
        iidx = jnp.int32
        dev = {}
        for key, t in self.tables.items():
            b = self.buckets[key]
            cells = t.get("cells", b.cells)
            # lean upload: only the batch-last tables of the (default) fused
            # semi-explicit path — the patch axis sits on the TPU lane
            # dimension, so the tiny element dims never hit the (8, 128)
            # tile padding.  The batch-major twins (J, perm, gdofs, ...) are
            # only needed by the legacy KKT / unfused paths and are uploaded
            # lazily by _ensure_full_tables (halves upload volume and time).
            d = {
                "divdiag": jnp.asarray(t["divdiag"], dt),
                "J_bl": jnp.asarray(
                    np.ascontiguousarray(np.moveaxis(t["J"], 0, -1)), dt),
                "K_bl": jnp.asarray(
                    np.ascontiguousarray(np.moveaxis(t["K"], 0, -1)), dt),
                "detJ_bl": jnp.asarray(
                    np.ascontiguousarray(t["detJ"].T), dt),
                "signs_bl": jnp.asarray(
                    np.ascontiguousarray(np.moveaxis(t["signs"], 0, -1)), dt),
                "combo_bl": jnp.asarray(
                    np.ascontiguousarray(t["combo"].T), jnp.int8),
                "cells_bl": jnp.asarray(
                    np.ascontiguousarray(cells.T), iidx),
                "gamma_bl": jnp.asarray(
                    np.ascontiguousarray(t["gamma"].T), dt),
                "cumalpha_bl": jnp.asarray(
                    np.ascontiguousarray(t["cumalpha"].T), dt),
            }
            if b.is_boundary:
                d["bspokes"] = jnp.asarray(t["bspokes"], iidx)
                d["z_is_lo"] = jnp.asarray(t["z_is_lo"])
            dev[key] = d
        refd = {
            name: jnp.asarray(arr, dt) for name, arr in self.ref.items()
        }
        refd["hat_grads"] = jnp.asarray(_HAT_GRADS, dt)
        # combine index tables: uploaded once; the fused program slices
        # <=1536-group segments out of them in-jit (static bounds) when the
        # whole-table gather's live intermediate would exceed the HBM budget
        for nm in ("01", "2"):
            refd["rows" + nm] = jnp.asarray(self._combine["rows" + nm],
                                            jnp.int32)
            refd["lane" + nm] = jnp.asarray(self._combine["lane" + nm],
                                            jnp.int32)
        from .semiexplicit import (
            combo_tensors, mass_matrices_bl, reduced_system_bl,
        )

        for name, arr in combo_tensors(self.k).items():
            refd[name] = jnp.asarray(arr, dt)
        from .stress import bsym_combo_tensors

        refd["BsymC"] = jnp.asarray(bsym_combo_tensors(self.k), dt)

        # geometry caches: element mass matrices and reduced H(div=0)
        # matrices are call-invariant — build them once per bucket shape.
        # Interior buckets additionally cache the explicit INVERSE (small,
        # well-conditioned SPD), turning the per-call batched solve into one
        # einsum; boundary buckets keep A_z (per-RHS essential masks modify
        # the system before solving).
        geom_jit = {}
        for key in sorted(self.tables.keys()):
            b = self.buckets[key]
            sig = (b.ncells, b.is_boundary, dev[key]["J_bl"].shape[-1])
            if sig not in geom_jit:
                def build(dvk, rf, _key=key, _inv=not b.is_boundary):
                    # see _equilibrate_impl_T: f32 matmul precision required
                    with jax.default_matmul_precision("float32"):
                        return build_inner(dvk, rf, _key, _inv)

                def build_inner(dvk, rf, _key, _inv):
                    Mc = mass_matrices_bl(self, _key, dvk, rf)
                    Az, _ = reduced_system_bl(self, _key, Mc, dvk)
                    if _inv:
                        Dz = Az.shape[0]
                        eye = jnp.broadcast_to(
                            jnp.eye(Dz, dtype=self.dtype)[..., None], Az.shape
                        )
                        # batch-last solve (no moveaxis relayouts)
                        Ainv = self._dense_solve_bl(Az, eye)
                        return Mc, Az, Ainv
                    return Mc, Az

                geom_jit[sig] = jax.jit(build)
            out = geom_jit[sig](dev[key], refd)
            dev[key]["Mc_bl"] = out[0]
            dev[key]["Az_bl"] = out[1]
            import os

            if len(out) == 3 and "EQLB_DISABLE_AINV" not in os.environ:
                dev[key]["Ainv_bl"] = out[2]
        self._dev, self._ref_dev = dev, refd
        return dev, refd

    def _ensure_full_tables(self):
        """Upload the batch-major table twins used by the legacy KKT /
        unfused / reduced-stress paths (the lean default upload carries only
        the batch-last semi-explicit tables)."""
        dev, _ = self._device_tables()
        if any("perm" in d for d in dev.values()):
            return
        dt = self.dtype
        iidx = jnp.int32
        for key, t in self.tables.items():
            b = self.buckets[key]
            cells = t.get("cells", b.cells)
            dev[key].update({
                "J": jnp.asarray(t["J"], dt),
                "detJ": jnp.asarray(t["detJ"], dt),
                "K": jnp.asarray(t["K"], dt),
                "perm": jnp.asarray(t["perm"], iidx),
                "signs": jnp.asarray(t["signs"], dt),
                "cells": jnp.asarray(cells, iidx),
                "lnode": jnp.asarray(t.get("lnode", b.lnode), iidx),
                "gdofs": jnp.asarray(t["gdofs"], iidx),
                "lv_hats": jnp.asarray(t["lv_hats"], iidx),
            })
        # dev pytree structure changed: retrace any captured jits
        self._jit_eq = None
        self._jit_eqT = None

    def ensure_stress_caches(self):
        """Build the geometry-only weak-symmetry caches (stress KKT matrix
        per bucket + constraint-column inverse blocks on interior buckets).
        Lazy: only stress workloads pay for them."""
        dev, refd = self._device_tables()
        if any("Bsym_bl" in d for d in dev.values()):
            return
        from .stress import build_stress_cache

        cache_jit = {}
        for key in sorted(self.tables.keys()):
            b = self.buckets[key]
            sig = (b.ncells, b.is_boundary, dev[key]["J_bl"].shape[-1])
            if sig not in cache_jit:
                def _build(dvk, rf, _key=key):
                    with jax.default_matmul_precision("float32"):
                        return build_stress_cache(self, _key, dvk, rf)

                cache_jit[sig] = jax.jit(_build)
            dev[key].update(cache_jit[sig](dev[key], refd))
        self._jit_eqT = None  # dev pytree changed: retrace

    # -------------------------------------------------------------------------

    def put_transposed(self, sigma_proj_dofs, rhs_dofs):
        """Host-transpose batch-major dof data to the semi-explicit path's
        batch-last layout and upload once; pass the result to ``equilibrate``
        with ``transposed_inputs=True`` to keep repeated calls free of
        host->device transfers."""
        dpT = jnp.asarray(
            np.ascontiguousarray(np.moveaxis(np.asarray(sigma_proj_dofs), 1, -1)),
            self.dtype,
        )
        drT = jnp.asarray(
            np.ascontiguousarray(np.moveaxis(np.asarray(rhs_dofs), 1, -1)),
            self.dtype,
        )
        return dpT, drT

    def equilibrate(
        self, sigma_proj_dofs, rhs_dofs, facet_kind, bvals,
        weak_symmetry=False, fuse=None, transposed_inputs=False,
        ws_skip_nodes=None,
    ):
        """Solve all patch problems; returns global RT dof vectors
        (n_rhs, ndofs_flux).

        Args (leading axis = n_rhs):
          sigma_proj_dofs (n_rhs, nc, 2, ndg): vector-DG dofs of sigma_proj
          rhs_dofs        (n_rhs, nc, ndg):    DG dofs of the projected RHS
          facet_kind      (n_rhs, nf) int8:    0 interior/outer, 1 flux-free
                                               (primal Dirichlet), 2 flux-
                                               essential (Neumann data)
          bvals           (n_rhs, nf, k):      facet dof values of the flux BC
          weak_symmetry:  treat rows 0, 1 as stress rows and apply the
                          patch-wise weak-symmetry correction before the
                          global scatter (reference FluxEqlbSE stress path)
        """
        dev, refd = self._device_tables()
        npatches = sum(b.npatches for b in self.buckets.values())
        if fuse is None:
            # one fused XLA program minimises dispatch overhead; with the
            # Pallas solver it also fits memory at any size (no padded
            # LuDecomposition temps).  The XLA-LU path rematerialises under
            # memory pressure at large patch counts, so it dispatches one
            # executable per bucket chunk there.
            fuse = (
                self.mode == "semiexplicit"
                or (self.solver == "pallas")
                or npatches <= 150_000
            )
        ws_skip = None
        if weak_symmetry and ws_skip_nodes is not None and len(ws_skip_nodes):
            ws_skip = {}
            for key, b in self.buckets.items():
                P = self.tables[key]["J"].shape[0]
                m = np.zeros(P, dtype=bool)
                m[: b.npatches] = np.isin(b.nodes, ws_skip_nodes)
                ws_skip[key] = jnp.asarray(m)
        on_fused_se = fuse and self.mode == "semiexplicit"
        if transposed_inputs and not on_fused_se:
            raise ValueError(
                "transposed_inputs=True requires the fused semi-explicit "
                "path (mode='semiexplicit', fuse=True): the batch-major "
                "fallback would silently mis-gather batch-last arrays"
            )
        if ws_skip is not None and not fuse:
            raise ValueError(
                "fuse=False does not support ws_skip_nodes (grouped "
                "deficient patches): the unfused path would solve the "
                "singular per-patch weak-symmetry systems anyway"
            )
        if fuse and self.mode == "semiexplicit":
            if weak_symmetry:
                self.ensure_stress_caches()
            n_rhs = sigma_proj_dofs.shape[0]
            self._ensure_combine_tables(n_rhs)
            # transpose to batch-last on the host when possible: a device
            # transpose reads the tile-padded batch-major layout (0.65 GB
            # for a 160k-cell mesh's 15 MB of data)
            if transposed_inputs:
                dpT, drT = sigma_proj_dofs, rhs_dofs
            elif isinstance(sigma_proj_dofs, np.ndarray):
                dpT, drT = self.put_transposed(sigma_proj_dofs, rhs_dofs)
            else:
                dpT = jnp.moveaxis(jnp.asarray(sigma_proj_dofs, self.dtype), 1, -1)
                drT = jnp.moveaxis(jnp.asarray(rhs_dofs, self.dtype), 1, -1)
            if getattr(self, "_jit_eqT", None) is None:
                self._jit_eqT = jax.jit(
                    self._equilibrate_impl_T, static_argnames=("weak_symmetry",)
                )
            return self._jit_eqT(
                dpT, drT, jnp.asarray(facet_kind),
                jnp.asarray(bvals, self.dtype), dev, refd, ws_skip,
                weak_symmetry=weak_symmetry,
            )
        args = (
            jnp.asarray(sigma_proj_dofs, self.dtype),
            jnp.asarray(rhs_dofs, self.dtype),
            jnp.asarray(facet_kind),
            jnp.asarray(bvals, self.dtype),
        )
        self._ensure_full_tables()  # legacy paths use batch-major tables
        dev, refd = self._device_tables()
        if not fuse:
            return self._equilibrate_unfused(*args, dev, refd, weak_symmetry)
        if self._jit_eq is None:
            self._jit_eq = jax.jit(
                self._equilibrate_impl, static_argnames=("weak_symmetry",)
            )
        return self._jit_eq(*args, dev, refd, weak_symmetry=weak_symmetry)

    def _equilibrate_unfused(self, d_proj, d_rhs, facet_kind, bvals, dev,
                             refd, weak_symmetry):
        """Per-bucket dispatch (fuse=False): one jitted executable per
        (bucket signature, padded patch count) from a MODULE-LEVEL cache, so
        adaptive loops — a fresh engine per refined mesh — reuse compiled
        bucket programs whose shapes recur (with ``pad_quantize`` most do).
        The cached closure binds its creator engine; all per-mesh data flows
        through the dv/refd arguments, and the engine-side statics
        (patch_idx, se_static, reference tensors) are functions of
        (k, bucket signature) only, so reuse across engines is exact."""
        if not hasattr(self, "_jit_scatter"):
            self._jit_scatter = jax.jit(
                lambda x, sol, gd: x.at[:, gd].add(sol), donate_argnums=0
            )

        def make(key):
            def run(dp, dr, fk, bv, dv, rf):
                with jax.default_matmul_precision("float32"):
                    sol = self._solve_bucket(key, dp, dr, fk, bv, dv, rf)
                    if weak_symmetry:
                        from .stress import weak_symmetry_bucket

                        delta = weak_symmetry_bucket(
                            self, key, sol[:2], fk[:2], dp[:2], dv, rf
                        )
                        sol = sol.at[:2].add(delta)
                    return sol

            return jax.jit(run)

        n_rhs = d_proj.shape[0]
        x = jnp.zeros((n_rhs, self.V.ndofs), self.dtype)
        for key in sorted(self.buckets.keys()):
            # npatches (the true count) never enters the traced program —
            # pads are solved too and scatter out of bounds — so reuse is
            # keyed on the PADDED patch count only
            jkey = (
                self.k, str(np.dtype(self.dtype)), self.mode, self.solver,
                key[:2], self.tables[key]["J"].shape[0], weak_symmetry,
            )
            fn = _UNFUSED_JIT_CACHE.get(jkey)
            if fn is None:
                if len(_UNFUSED_JIT_CACHE) >= 64:  # bound closure-held
                    _UNFUSED_JIT_CACHE.clear()  # engines (host tables)
                fn = _UNFUSED_JIT_CACHE[jkey] = make(key)
            sol = fn(d_proj, d_rhs, facet_kind, bvals, dev[key], refd)
            x = self._jit_scatter(x, sol, dev[key]["gdofs"])
        return x

    def _equilibrate_impl(
        self, d_proj, d_rhs, facet_kind, bvals, dev, refd, weak_symmetry=False
    ):
        if self.mode == "semiexplicit":
            return self._equilibrate_impl_T(
                jnp.moveaxis(d_proj, 1, -1), jnp.moveaxis(d_rhs, 1, -1),
                facet_kind, bvals, dev, refd, weak_symmetry=weak_symmetry,
            )
        n_rhs = d_proj.shape[0]
        x = jnp.zeros((n_rhs, self.V.ndofs), self.dtype)
        for key in sorted(self.buckets.keys()):
            sol = self._solve_bucket(
                key, d_proj, d_rhs, facet_kind, bvals, dev[key], refd
            )
            if weak_symmetry:
                from .stress import weak_symmetry_bucket

                delta = weak_symmetry_bucket(
                    self, key, sol[:2], facet_kind[:2], d_proj[:2], dev[key], refd
                )
                sol = sol.at[:2].add(delta)
            x = x.at[:, dev[key]["gdofs"]].add(sol)
        return x

    def _equilibrate_impl_T(
        self, dpT, drT, facet_kind, bvals, dev, refd, ws_skip=None,
        weak_symmetry=False,
    ):
        """Semi-explicit fused program on pre-transposed (batch-last) data:
        dpT (n_rhs, 2, ndg, nc), drT (n_rhs, ndg, nc)."""
        with jax.default_matmul_precision("float32"):
            return self._equilibrate_impl_T_inner(
                dpT, drT, facet_kind, bvals, dev, refd, ws_skip,
                weak_symmetry,
            )

    def _equilibrate_impl_T_inner(
        self, dpT, drT, facet_kind, bvals, dev, refd, ws_skip,
        weak_symmetry,
    ):
        # NOTE: full f32 matmul precision is load-bearing — the TPU default
        # demotes f32 einsum contractions to one bf16 pass, which put a
        # 2.7e-3 relative error on the equilibrated dofs (measured in
        # scripts/onchip_accuracy.py before the fix)
        from .semiexplicit import solve_bucket_semiexplicit
        from .stress import weak_symmetry_bucket

        n_rhs = dpT.shape[0]
        dprT = jnp.concatenate([dpT, drT[:, None]], axis=1)
        # cell-major copy of the per-cell dof data, shared by every bucket's
        # row gather (see load_moments_bl).  Padded to exactly 128 lanes:
        # XLA only lowers the gather as a vectorized full-tile row fetch
        # when the source minor dim is the native 128-lane tile (measured:
        # the 27-lane form runs at the same 14 ns/element as the old
        # minor-axis gather)
        nc = dprT.shape[-1]
        w = dprT.shape[1] * dprT.shape[2] * n_rhs
        # n_rhs == 1 keeps the minor-axis gather: 9 source rows stay under
        # the slow-lowering threshold and measure 44 ms vs 64 ms packed
        if dprT.dtype == jnp.float64 and self._use_ds_combine(1) \
                and 2 * w <= 128:
            # double-single source: the f64 per-cell data rides the row
            # gather as [hi | lo] f32 halves (exact split) and is
            # reconstructed in f64 after the gather — the emulated-f64
            # gather was a dominant mixed-path cost (load_moments_bl)
            hi = dprT.astype(jnp.float32).reshape(-1, nc)
            lo = (dprT - hi.astype(jnp.float64).reshape(dprT.shape)).astype(
                jnp.float32).reshape(-1, nc)
            src_packed = jnp.moveaxis(
                jnp.concatenate([hi, lo], axis=0), 0, 1)
            src_packed = jnp.pad(src_packed, ((0, 0), (0, 128 - 2 * w)))
            src_packed = jax.lax.optimization_barrier(src_packed)
        elif 1 < n_rhs and w <= 128:
            src_packed = jnp.moveaxis(dprT.reshape(-1, nc), 0, 1)
            src_packed = jnp.pad(src_packed, ((0, 0), (0, 128 - w)))
            src_packed = jax.lax.optimization_barrier(src_packed)
        else:
            src_packed = None
        flats = []
        for key in sorted(self.buckets.keys()):
            sol_bl = solve_bucket_semiexplicit(
                self, key, dprT, facet_kind, bvals, dev[key], refd,
                src_packed=src_packed,
            )
            # fusion fence: under whole-program fusion pressure this backend
            # miscompiles one lane tile of the bucket pipeline to NaN (the
            # isolated bucket program is bit-clean) — keep bucket pipelines
            # from fusing into each other / the combine
            sol_bl = jax.lax.optimization_barrier(sol_bl)
            if weak_symmetry:
                if "Bsym_bl" in dev[key]:
                    from .stress import weak_symmetry_bucket_bl

                    delta = weak_symmetry_bucket_bl(
                        self, key, sol_bl[:2], facet_kind[:2], dev[key], refd,
                        skip=None if ws_skip is None else ws_skip[key],
                    )
                    delta = jax.lax.optimization_barrier(delta)
                    sol_bl = sol_bl.at[:2].add(delta)
                else:
                    d_proj2 = jnp.moveaxis(dpT[:2], -1, 1)
                    sol = jnp.moveaxis(sol_bl, -1, 1)  # (n_rhs, P, nflux)
                    delta = weak_symmetry_bucket(
                        self, key, sol[:2], facet_kind[:2], d_proj2,
                        dev[key], refd,
                    )
                    sol_bl = sol_bl.at[:2].add(jnp.moveaxis(delta, 1, -1))
            if self._patch_major:
                # paired combine tables address PATCH-MAJOR positions
                # (off + p * nflux + f): transpose the batch-last solution
                flats.append(jnp.moveaxis(sol_bl, -1, 1).reshape(n_rhs, -1))
            else:
                flats.append(sol_bl.reshape(n_rhs, -1))
        flat = jnp.concatenate(flats, axis=1)
        if os.environ.get("EQLB_SKIP_COMBINE"):
            # timing diagnostic ONLY: drop the dof-combine program tail
            # (output has the right (n_rhs, ndofs) shape but wrong values)
            return flat[:, : self.V.ndofs]
        return self._combine_flat(flat, refd)

    def _combine_flat(self, flat, refd):
        """Global accumulation of the concatenated flat bucket solutions
        (n_rhs, L) -> (n_rhs, ndofs).

        Measured-fastest paths (the TPU gather runs ~220M idx/s while its
        source stays cache-resident and drops to ~133M idx/s past a cliff
        near 128 MB — measured on v5e with the real index tables):
        * n_rhs == 1 — row gather + Pallas lane select (row fetches process
          ~2x the indices/s of element gathers; source ~50 MB at 1M cells);
          with PAIR tables (even k, see _build_paired_tables) each index
          serves 2 adjacent dofs, halving the index count again;
        * n_rhs >= 2 with PAIR tables — lane-packed passes sized by
          _pack_groups: rows hold 128 // R positions x R RHS lanes, so one
          index serves 2 dofs x R RHS (2R offset lanes per select) and an
          R = n_rhs pass has the 1-field index count.  Pack sizes are
          capped so each pass's source stays under the cache cliff
          (3-field at 1M cells: one R=3 pass 180 ms -> 3 per-field passes
          125 ms, PROFILE_COMBINE_STRATEGIES.json);
        * unpaired (odd k) — pairwise R=2 passes (unpaired R=3 measured
          192 ms vs ~100 ms pairwise: without pairs the extra lanes per
          row buy nothing and the source grows past the cliff);
        * measured dead ends at 3 RHS / 1M cells (PROFILE_COMBINE_V2 /
          _ELEM3): a single rhs-BLOCK packed pass 164 ms (the pack alone
          is ~35 ms at ~6 GB/s — minor-dim composition is slow on this
          backend), chunk-permuted cache-resident source segments 161 ms
          (slicing eats what residency saves), batched element gather
          204 ms (its cost is NOT n_rhs-independent end-to-end).  The
          per-field paired passes below are the practical floor;
        * f64-on-TPU / off-TPU — batched element gathers (pure XLA; the
          elem tables follow whichever flat layout is active)."""
        n_rhs = flat.shape[0]
        cm = self._combine
        ndofs = self.V.ndofs
        paired = self._patch_major

        if flat.dtype == jnp.float64 and self._use_ds_combine(n_rhs):
            return self._ds_combine(flat, refd)

        if self._use_elem_combine(n_rhs):
            flat = jnp.pad(flat, ((0, 0), (0, cm["Lpad"] - flat.shape[1])))
            gA = flat[:, refd["elem_c0"]]
            gB = flat[:, refd["elem_c1"]]
            g2 = flat[:, refd["elem_c2"]]
            x = gA + gB
            return x.at[:, cm["nfk"] :].add(g2)

        if n_rhs >= 2 and paired:
            groups = self._pack_groups(n_rhs)
            if groups == [n_rhs]:
                return self._packed_combine(flat, refd)
            parts, r = [], 0
            for g in groups:
                if g >= 2:
                    parts.append(self._packed_combine(flat[r: r + g], refd))
                else:
                    parts.append(self._combine_flat(flat[r: r + 1], refd))
                r += g
            return jnp.concatenate(parts, axis=0)

        if n_rhs >= 3:
            parts = [
                self._combine_flat(flat[r: r + 2], refd)
                for r in range(0, n_rhs, 2)
            ]
            return jnp.concatenate(parts, axis=0)

        if n_rhs == 2:
            Lpos = self._lpad(2)
            flat = jnp.pad(flat, ((0, 0), (0, Lpos - flat.shape[1])))
            # 64 positions x 2 RHS lanes per 128-lane row
            f2p = jnp.moveaxis(flat, 0, 1).reshape(-1, 128)

            def pick2(nm, npos):
                out = self._row_gather_select(
                    f2p, refd[f"rows{nm}R2"], refd[f"lane{nm}R2"], 2,
                    flat.dtype)
                return out[:, :npos]

            x = pick2("01", ndofs)
            tail = pick2("2", ndofs - cm["nfk"])
            return x.at[:, cm["nfk"] :].add(tail)

        # n_rhs == 1
        flat = jnp.pad(flat, ((0, 0), (0, cm["Lpad"] - flat.shape[1])))
        f2 = flat.reshape(-1, 128)
        n_out = 2 if paired else 1  # paired: both dofs of the pair per index

        def pick1(nm, npos):
            out = self._row_gather_select(
                f2, refd["rows" + nm], refd["lane" + nm], n_out, flat.dtype)
            if not paired:
                return out[:, :npos]
            return jnp.moveaxis(out, 0, -1).reshape(1, -1)[:, :npos]

        x = pick1("01", ndofs)
        tail = pick1("2", ndofs - cm["nfk"])
        return x.at[:, cm["nfk"] :].add(tail)

    def _packed_combine(self, flat, refd):
        """One R = n_rhs lane-packed PAIRED pass: (R, L) -> (R, ndofs).

        Rows of the packed layout hold W = 128 // R positions x R RHS lanes
        (position-major), so flat element (position p, rhs r) sits at lane
        (p % W) * R + r.  Pair positions are adjacent and W is even for
        R <= 4, so the pair partner shares the row: one gathered row serves
        2 dofs x R RHS via the 2R consecutive select offsets o = m * R + r
        (m = pair member).  The index count for all R fields equals the
        1-field paired count."""
        R = flat.shape[0]
        cm = self._combine
        ndofs = self.V.ndofs
        W = 128 // R
        assert W % 2 == 0, "pair partner would straddle a packed row"
        Lpos = self._lpad(R)
        flat = jnp.pad(flat, ((0, 0), (0, Lpos - flat.shape[1])))
        f2p = jnp.moveaxis(flat, 0, 1).reshape(-1, W * R)
        if W * R < 128:  # non-divisor R (e.g. 3): dead trailing lanes
            f2p = jnp.pad(f2p, ((0, 0), (0, 128 - W * R)))

        def pick(nm, npos):
            out = self._row_gather_select(
                f2p, refd[f"rows{nm}R{R}"], refd[f"lane{nm}R{R}"], 2 * R,
                flat.dtype)
            # out[m * R + r, j] = pair member m, RHS r of pair j:
            # interleave the pair axis into the dof axis
            arr = out.reshape(2, R, -1)
            return jnp.moveaxis(arr, 0, -1).reshape(R, -1)[:, :npos]

        x = pick("01", ndofs)
        tail = pick("2", ndofs - cm["nfk"])
        return x.at[:, cm["nfk"] :].add(tail)

    def _ds_combine(self, flat, refd):
        """Double-single 1-field combine: (1, L) f64 -> (1, ndofs) f64.

        The f64 flat solution is split exactly into (hi, lo) f32 planes
        (hi = f32(v), lo = f32(v - hi): |v - hi - lo| <= 2^-48 |v|), which
        ride the R = 2 lane-packed PAIRED layout — plane r of position p at
        lane (p % 64) * 2 + r, so one gathered 128-lane f32 row serves both
        dofs of a pair x both planes with the 1-field index count.  The
        select kernel 2Sum-compensates the contributor additions
        (ops.lane_select_ds) and the f64 value is reconstructed afterwards;
        the contributor-class add happens in f64."""
        cm = self._combine
        ndofs = self.V.ndofs
        Lpos = self._lpad(2)
        hi = flat.astype(jnp.float32)
        lo = (flat - hi.astype(jnp.float64)).astype(jnp.float32)
        planes = jnp.concatenate([hi, lo], axis=0)  # (2, L) f32
        planes = jnp.pad(planes, ((0, 0), (0, Lpos - flat.shape[1])))
        f2p = jnp.moveaxis(planes, 0, 1).reshape(-1, 128)

        def pick(nm, npos):
            # base offsets 2m address pair member m's (hi, lo) lane pair
            out = self._row_gather_select_ds(
                f2p, refd[f"rows{nm}R2"], refd[f"lane{nm}R2"], (0, 2))
            vals = [out[2 * m].astype(jnp.float64)
                    + out[2 * m + 1].astype(jnp.float64) for m in (0, 1)]
            xy = jnp.stack(vals)  # (2 = pair member, npairs)
            return jnp.moveaxis(xy, 0, -1).reshape(1, -1)[:, :npos]

        x = pick("01", ndofs)
        tail = pick("2", ndofs - cm["nfk"])
        return x.at[:, cm["nfk"]:].add(tail)

    def _row_gather_select_ds(self, f2, rows_all, lane_all, base_offs):
        """Segmented row gather + double-single select epilogue: like
        _row_gather_select but emitting a 2Sum-compensated (hi, lo) f32
        plane pair per base offset.  Returns (2 * len(base_offs), G * 1024)
        f32."""
        from ..ops.lane_select import lane_select_ds

        G, C = lane_all.shape[0], lane_all.shape[1]
        if G == 0:
            return jnp.zeros((2 * len(base_offs), 0), jnp.float32)
        gseg = G
        if G * 1024 * C * 512 > (6 << 30):
            gseg = 4096
        segs = []
        for g0 in range(0, G, gseg):
            g1 = min(g0 + gseg, G)
            rows_flat = jax.lax.slice_in_dim(
                rows_all, g0 * 1024 * C, g1 * 1024 * C)
            lane = jax.lax.slice_in_dim(lane_all, g0, g1)
            rg = f2[rows_flat].reshape(g1 - g0, 8, 128, C, 128)
            segs.append(lane_select_ds(rg, lane, base_offs))
        out = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
        return out.reshape(2 * len(base_offs), -1)

    def _row_gather_select(self, f2, rows_all, lane_all, n_out, dtype):
        """Segmented 128-lane row gather + Pallas lane select epilogue.

        Fetches full rows ``f2[rows]`` (flat-index gather — the TPU backend
        rejects >2D index arrays) reshaped to the select kernel's
        (G, 8, 128, C, 128) layout, then emits ``n_out`` consecutive lanes
        per index (lane_select_multi offsets serve pair partners and packed
        RHS lanes).  The index tables are sliced in-jit (static bounds)
        into bounded segments when needed so the gathered-row intermediate
        stays bounded (one unsegmented gather holds ~5 GB at 1M cells and
        OOMs).  Returns (n_out, G * 1024)."""
        from ..ops.lane_select import lane_select_multi

        G, C = lane_all.shape[0], lane_all.shape[1]
        if G == 0:  # empty contributor class (e.g. no cell dofs at k=1)
            return jnp.zeros((n_out, 0), dtype)
        gseg = G
        if G * 1024 * C * 512 > (6 << 30):
            gseg = 4096
        segs = []
        for g0 in range(0, G, gseg):
            g1 = min(g0 + gseg, G)
            rows_flat = jax.lax.slice_in_dim(
                rows_all, g0 * 1024 * C, g1 * 1024 * C)
            lane = jax.lax.slice_in_dim(lane_all, g0, g1)
            rg = f2[rows_flat].reshape(g1 - g0, 8, 128, C, 128)
            segs.append(lane_select_multi(rg, lane, n_out))
        out = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
        return out.reshape(n_out, -1)

    # -------------------------------------------------------------------------

    def _solve_bucket(self, key, d_proj, d_rhs, facet_kind, bvals, dv, refd):
        if self.mode == "semiexplicit":
            from .semiexplicit import solve_bucket_semiexplicit

            dpT = jnp.moveaxis(d_proj, 1, -1)
            drT = jnp.moveaxis(d_rhs, 1, -1)
            sol_bl = solve_bucket_semiexplicit(
                self, key, jnp.concatenate([dpT, drT[:, None]], axis=1),
                facet_kind, bvals, dv, refd,
            )
            return jnp.moveaxis(sol_bl, -1, 1)
        Ar, br, nflux = self._assemble_bucket(
            key, d_proj, d_rhs, facet_kind, bvals, dv, refd
        )
        sol = self._dense_solve(Ar, br[..., None])[..., 0]
        return sol[:, :, :nflux]

    def _dense_solve(self, A, b):
        D = A.shape[-1]
        # the Pallas solver keeps 2 (D, D, 128) f32 tiles in VMEM; beyond
        # D ~ 96 that exceeds the ~16 MB budget -> fall back to XLA LU
        if self.solver == "pallas" and D * D * 128 * 4 * 2 < 12 * 2**20:
            from ..ops.patch_solve import batched_kkt_solve

            return batched_kkt_solve(A, b)
        return jnp.linalg.solve(A, b)

    def _dense_solve_pivoted_bl(self, A, b):
        """Batch-last PIVOTED solve (XLA LU): A (D, D, X), b (D, R, X).
        For the indefinite weak-symmetry KKT systems: symmetric patches
        (e.g. the 8-cell stars of crossed meshes) put an exactly-zero pivot
        in the pivot-free elimination order even though the matrix itself is
        well conditioned (measured pivot 3e-19 at cond 5e5)."""
        Ab = jnp.moveaxis(A, -1, 0)
        bb = jnp.moveaxis(b, -1, 0)
        return jnp.moveaxis(jnp.linalg.solve(Ab, bb), 0, -1)

    def _dense_solve_bl(self, A, b):
        """Batch-last solve: A (D, D, X), b (D, R, X) -> (D, R, X).

        solver == "pallas_mixed" + f64 operands: mixed-precision iterative
        refinement — factor/solve on the f32 Pallas kernel (the TPU has no
        native f64 LU), then one f64 residual-correction pass (two cheap
        matvec loops).  One step reduces the f32 solve's O(1e-5) relative
        error to ~f64 level for these small well-conditioned patch systems;
        since the cached bucket inverses are built THROUGH this routine,
        the steady-state path inherits the accuracy with no per-call cost
        beyond f64 arithmetic."""
        if self.solver in ("pallas", "pallas_mixed"):
            from ..ops.patch_solve import batched_kkt_solve_bl

            if self.solver == "pallas_mixed" and A.dtype == jnp.float64:
                f32, f64 = jnp.float32, jnp.float64
                A32 = A.astype(f32)
                y = batched_kkt_solve_bl(A32, b.astype(f32)).astype(f64)
                D = A.shape[0]
                # explicit j-sum: tiny-D dot_generals relayout-pad on this
                # backend (see solve_bucket_semiexplicit)
                for _ in range(self.mixed_refine_steps):
                    r = b
                    for j in range(D):
                        r = r - A[:, j, None, :] * y[j][None]
                    d = batched_kkt_solve_bl(A32, r.astype(f32)).astype(f64)
                    y = y + d
                return y
            return batched_kkt_solve_bl(A, b)
        Ab = jnp.moveaxis(A, -1, 0)
        bb = jnp.moveaxis(b, -1, 0)
        return jnp.moveaxis(jnp.linalg.solve(Ab, bb), 0, -1)

    def _element_data(self, key, d_proj, d_rhs, dv, refd):
        """Canonical per-cell element tensors of one bucket:
        Mc (P,n,nkeep,nkeep), Bc (P,n,nkeep,ndg), Fv (n_rhs,P,n,nkeep),
        Fq (n_rhs,P,n,ndg) — shared by the KKT and semi-explicit paths."""
        b = self.buckets[key]
        k = self.k
        ndg = k * (k + 1) // 2
        n = b.ncells
        P = dv["J"].shape[0]  # padded patch count
        n_rhs = d_proj.shape[0]
        dt = self.dtype
        J, detJ, K = dv["J"], dv["detJ"], dv["K"]
        adet = jnp.abs(detJ)
        sdet = jnp.sign(detJ)
        perm, signs = dv["perm"], dv["signs"]
        cells, lnode = dv["cells"], dv["lnode"]

        # --- element tensors in canonical order --------------------------------
        JtJ = jnp.einsum("pcka,pckb->pcab", J, J)
        Mgeo = jnp.einsum("pcab,abij->pcij", JtJ, refd["Mhat"])
        Mgeo = Mgeo / adet[..., None, None]
        Mc = jnp.take_along_axis(Mgeo, perm[..., None], axis=2)
        Mc = jnp.take_along_axis(Mc, perm[..., None, :], axis=3)
        Mc = Mc * signs[..., :, None] * signs[..., None, :]

        Dg = refd["Dhat"][perm]  # (P, n, nkeep, ndg)
        Bc = sdet[..., None, None] * Dg * signs[..., None]

        # --- per-cell RHS data ---------------------------------------------------
        # the hat-function index lnode takes only 3 values: contract against
        # each reference slice and blend with one-hot masks instead of
        # gathering (P, n, ...) tables — TPU tiling pads tiny trailing dims
        # of materialized gathers by 16-85x (observed OOM on 1M-cell meshes)
        dp = d_proj[:, cells]  # (n_rhs, P, n, 2, ndg)
        fr = d_rhs[:, cells]  # (n_rhs, P, n, ndg)
        dpJ = jnp.einsum("rpcam,pcab->rpcbm", dp, J)  # (n_rhs, P, n, 2, ndg)
        Fv_full = jnp.zeros(dp.shape[:3] + (refd["Rhat"].shape[-1],), dt)
        Fq = jnp.zeros((n_rhs, P, n, ndg), dt)
        for l in range(3):
            wl = (lnode == l).astype(dt)  # (P, n)
            Fv_full = Fv_full + wl[None, ..., None] * jnp.einsum(
                "rpcbm,mbi->rpci", dpJ, refd["Rhat"][l]
            )
            Fq = Fq + wl[None, ..., None] * jnp.einsum(
                "rpcm,mq->rpcq", fr, refd["T3"][l]
            )
            # grad(psi)_a = K_{ba} ghat_b contribution
            gpsi_l = jnp.einsum("pcba,b->pca", K, refd["hat_grads"][l])
            Fq = Fq + wl[None, ..., None] * jnp.einsum(
                "pca,rpcaq->rpcq", gpsi_l, dp
            )
        Fv_full = Fv_full * sdet[None, ..., None]
        Fq = Fq * adet[None, ..., None]
        Fv = jnp.take_along_axis(
            Fv_full, perm[None].repeat(n_rhs, 0), axis=3
        ) * signs[None]
        return Mc, Bc, Fv, Fq

    def _boundary_ess(self, key, facet_kind, bvals, dv, refd):
        """Essential-spoke markers and hat-weighted dof values of a boundary
        bucket: (ess (n_rhs,P,2) bool, hatvals (n_rhs,P,2,k)).  (None, None)
        for interior buckets."""
        b = self.buckets[key]
        if not b.is_boundary:
            return None, None
        k = self.k
        dt = self.dtype
        bsp = dv["bspokes"]  # (P, 2)
        kind = facet_kind[:, bsp]  # (n_rhs, P, 2)
        z_lo = dv["z_is_lo"]  # (P, 2)
        # hat-weighted dof values on flux-essential spokes:
        # alpha_j = bvals_j * (2j+1); val_m = alpha_j Wend[end, j, m]
        scale = jnp.asarray(2.0 * np.arange(k) + 1.0, dt)
        alpha = bvals[:, bsp] * scale  # (n_rhs, P, 2, k)
        Wend = refd["Wend"]  # (2, k, k)
        Wsel = jnp.where(z_lo[..., None, None], Wend[0], Wend[1])
        hatvals = jnp.einsum("rpej,pejm->rpem", alpha, Wsel)
        return kind == 2, hatvals

    def _assemble_bucket(self, key, d_proj, d_rhs, facet_kind, bvals, dv, refd):
        b = self.buckets[key]
        t = self.tables[key]
        k = self.k
        kk1 = self.V.element.ndofs_cell
        ndg = k * (k + 1) // 2
        n, ns = b.ncells, b.nspokes
        P = dv["J"].shape[0]  # padded patch count
        n_rhs = d_proj.shape[0]

        D = ns * k + n * kk1 + n * ndg
        nflux = ns * k + n * kk1

        dt = self.dtype
        adet = jnp.abs(dv["detJ"])
        Mc, Bc, Fv, Fq = self._element_data(key, d_proj, d_rhs, dv, refd)

        # --- assemble the dense patch systems -----------------------------------
        A = jnp.zeros((P, D, D), dt)
        bvec = jnp.zeros((n_rhs, P, D), dt)
        cvec = jnp.zeros((P, n * ndg), dt)  # constraint mean-mode vector
        cpen = refd["cpen"]
        pidx = t["patch_idx"]  # (n, nkeep) static numpy
        for i in range(n):
            ix = pidx[i]
            qrow = ns * k + n * kk1 + i * ndg + np.arange(ndg)
            A = A.at[:, ix[:, None], ix[None, :]].add(Mc[:, i])
            A = A.at[:, qrow[:, None], ix[None, :]].add(
                jnp.swapaxes(Bc[:, i], 1, 2)
            )
            A = A.at[:, ix[:, None], qrow[None, :]].add(-Bc[:, i])
            cvec = cvec.at[:, i * ndg + np.arange(ndg)].add(
                adet[:, i, None] * cpen[None, :]
            )
            bvec = bvec.at[:, :, ix].add(Fv[:, :, i])
            bvec = bvec.at[:, :, qrow].add(Fq[:, :, i])

        # --- essential conditions ------------------------------------------------
        mask = jnp.zeros((n_rhs, P, D), dtype=bool)
        values = jnp.zeros((n_rhs, P, D), dt)
        if b.is_boundary:
            ess, hatvals = self._boundary_ess(key, facet_kind, bvals, dv, refd)
            for e, sp in enumerate((0, ns - 1)):
                cols = sp * k + np.arange(k)
                mask = mask.at[:, :, cols].set(ess[:, :, e : e + 1])
                values = values.at[:, :, cols].set(
                    jnp.where(ess[:, :, e : e + 1], hatvals[:, :, e], 0.0)
                )
            # multiplier active only if both spokes are flux-essential
            lam_on = ess[:, :, 0] & ess[:, :, 1]
        else:
            lam_on = jnp.ones((n_rhs, P), dtype=bool)

        # mean-value multiplier as an exact rank-1 regularization: the
        # constraint Schur complement B M^-1 B^T is PSD with null space
        # spanned by the constant mode c on interior / pure-Neumann patches;
        # adding beta c c^T to the r-block leaves sigma unchanged (B^T c = 0)
        # and makes every pivot of the [sigma | r] ordering structurally
        # nonzero — the bordered-lambda form of the reference
        # (ev/assembly.hpp:280-305) would hit an exactly-zero pivot in the
        # pivot-free on-chip factorization (ops.patch_solve)
        R1 = cvec[:, :, None] * cvec[:, None, :] / (
            jnp.einsum("pq,pq->p", cvec, cvec)[:, None, None]
        )
        Ar = jnp.broadcast_to(A[None], (n_rhs,) + A.shape)
        Ar = Ar + jnp.where(
            lam_on[..., None, None],
            jnp.pad(R1, ((0, 0), (nflux, 0), (nflux, 0)))[None],
            0.0,
        )
        eye = jnp.eye(D, dtype=dt)
        Ar = jnp.where(mask[..., None], eye[None, None], Ar)
        br = jnp.where(mask, values, bvec)
        return Ar, br, nflux
