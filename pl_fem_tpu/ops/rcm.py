"""Bandwidth-reduced DOF/element ordering for the Pallas fused apply.

The Chebyshev hot loop is HBM-traffic-bound: every operator/mass apply
streams the padded per-entry intermediates (E*6 rows x lanes) through
HBM three times (gather, einsum I/O, accumulate).  A fused Pallas
kernel can hold one DOF tile's worth of work entirely in VMEM — but
only if each tile of output DOFs is touched by a *bounded, contiguous*
window of elements, and those elements reference a bounded window of
input DOFs.  Reverse-Cuthill-McKee over the P2 DOF graph provides
exactly that: 2D meshes reorder to bandwidth O(sqrt(D)).

The plan is a sidecar to :class:`~pl_fem_tpu.ops.femgrid.DeviceGrid`:
the grid's native numbering (vertices first, then edges — required by
the split gather tables of the XLA fallback path) is untouched.  The
solver permutes the subspace into RCM space at filter-pass boundaries
(two row-gathers per pass, negligible) and runs the whole recurrence
there.

No reference analog: the reference hands assembled CSR matrices to
ARPACK and never controls data movement (solver_fem.py:196-197).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass
class RCMPlan:
    """Tile/window tables for the fused Pallas apply (host numpy)."""

    # permutations over the PADDED dof axis (invalid dofs stay last)
    to_rcm: np.ndarray       # (D,) int32: X_rcm = X[to_rcm]
    from_rcm: np.ndarray     # (D,) int32: X = X_rcm[from_rcm]
    # elements in window order (sorted by min rcm dof; pads last)
    eorder: np.ndarray       # (E,) int32 into original element axis
    elem_dofs_r: np.ndarray  # (E, 6) int32 rcm dof ids, window order
    # per-tile element windows: tile t consumes elements
    # [e_start[t], e_start[t] + win_elems) of the window order
    tile: int                # output dofs per tile
    win_elems: int           # padded element-window width (shared)
    e_start: np.ndarray      # (T,) int32
    # scatter targets: for window element j, local dof row of entry
    # (j, l) in tile t is starget[t, j, l]; rows >= tile are parked
    # (accumulated into scratch rows and discarded)
    starget: np.ndarray      # (T, win_elems, 6) int32
    # input window: elements of tile t read rcm dofs
    # [x_start[t], x_start[t] + win_dofs)
    win_dofs: int
    x_start: np.ndarray      # (T,) int32
    # gather sources: window element j's dof l lives at local row
    # gsource[t, j, l] of the input window (pad elements -> parked row)
    gsource: np.ndarray      # (T, win_elems, 6) int32
    # accumulate (gather formulation): dof row d of tile t sums entry
    # rows gidx[t, d, :gdeg[t, d]] of the tile's ENTRY window
    # (win_elems * 6 rows of the flat element-entry array, starting at
    # e_start[t] * 6); remaining slots point at the parked zero row
    # win_elems * 6
    gdeg: np.ndarray         # (T, tile) int32
    gidx: np.ndarray         # (T, tile, gw) int32
    gw: int                  # max dof valence (slots per row)
    # SMEM-packed accumulate table: slot d*(gw+1) of tile t is dof d's
    # degree, slots d*(gw+1)+1.. its window-local entry rows. Shaped
    # (T, rows, 128) int32 so a per-tile slice DMAs with (8,128)
    # alignment; read as pack[j // 128, j % 128].
    acc_pack: np.ndarray     # (T, pack_rows, 128) int32
    n_tiles: int
    bandwidth: int           # rcm dof bandwidth (diagnostic)


def build_rcm_plan(dg, tile: int = 256,
                   elem_round: int = 64) -> Optional[RCMPlan]:
    """Build the fused-apply plan for a DeviceGrid; None if degenerate."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    D = dg.dof_coords.shape[0]
    E = dg.elem_dofs.shape[0]
    ne, nd = dg.n_elems, dg.n_dofs
    ed = dg.elem_dofs[:ne].astype(np.int64)

    # P2 dof adjacency (element cliques)
    rows = np.repeat(ed, 6, axis=1).ravel()
    cols = np.tile(ed, (1, 6)).ravel()
    A = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                      shape=(nd, nd)).tocsr()
    order = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))

    # old dof -> rcm position; padded dofs keep their (invalid) slots
    to_rcm = np.arange(D, dtype=np.int32)
    to_rcm[:nd] = order.astype(np.int32)
    from_rcm = np.empty(D, dtype=np.int32)
    from_rcm[to_rcm] = np.arange(D, dtype=np.int32)
    rank = from_rcm[:nd]                      # old dof id -> rcm index

    edr = rank[ed]                            # (ne, 6) rcm dof ids
    emin = edr.min(axis=1)
    emax = edr.max(axis=1)
    bandwidth = int((emax - emin).max()) if ne else 0

    eorder_v = np.argsort(emin, kind="stable").astype(np.int32)
    eorder = np.concatenate(
        [eorder_v, np.arange(ne, E, dtype=np.int32)])
    edr_w = edr[eorder_v]                     # window order
    emin_w = emin[eorder_v]
    emax_w = emax[eorder_v]

    if D % tile != 0:
        return None           # bucket rounding must be a tile multiple
    T = D // tile             # cover ALL padded rows (pad tiles: zeros)
    # window of tile t: all elements with emax >= t*tile and
    # emin < (t+1)*tile; emin sorted => suffix bound from searchsorted
    hi = np.searchsorted(emin_w, np.arange(1, T + 1) * tile, side="left")
    lo = np.empty(T, dtype=np.int64)
    for t in range(T):
        touch = np.nonzero(emax_w[: hi[t]] >= t * tile)[0]
        lo[t] = touch[0] if len(touch) else hi[t]
    # element window starts are rounded down to a multiple of 4 so the
    # ENTRY window start (x6) lands on an 8-row DMA sublane boundary
    lo = (lo // 4) * 4
    widths = hi - lo
    win_elems = max(int(_round_up(max(int(widths.max()), 1), elem_round)),
                    elem_round)

    # input dof windows
    x_lo = np.empty(T, dtype=np.int64)
    x_hi = np.empty(T, dtype=np.int64)
    for t in range(T):
        if hi[t] > lo[t]:
            x_lo[t] = int(emin_w[lo[t]: hi[t]].min())
            x_hi[t] = int(emax_w[lo[t]: hi[t]].max()) + 1
        else:
            x_lo[t], x_hi[t] = t * tile, t * tile + 1
    win_dofs = max(_round_up(int((x_hi - x_lo).max()), 8), 8)
    if win_dofs > D:
        return None
    x_start = np.minimum(x_lo, D - win_dofs).astype(np.int32)
    e_start = np.minimum(lo, max(E - win_elems, 0)).astype(np.int32)

    counts = np.bincount(edr.ravel(), minlength=nd)
    gw = int(counts.max()) if nd else 0

    starget = np.full((T, win_elems, 6), tile, dtype=np.int32)
    gsource = np.full((T, win_elems, 6), win_dofs, dtype=np.int32)
    gdeg = np.zeros((T, tile), dtype=np.int32)
    gidx = np.full((T, tile, gw), win_elems * 6, dtype=np.int32)
    for t in range(T):
        js = np.arange(e_start[t], min(e_start[t] + win_elems, ne))
        if len(js) == 0:
            continue
        dofs = edr_w[js]                      # (w, 6) rcm ids
        local = dofs - t * tile
        inside = (local >= 0) & (local < tile)
        st = np.where(inside, local, tile)
        starget[t, : len(js)] = st
        # Elements admitted only by the e_start clamp (window slid below
        # lo[t] near the array end) are always parked (emax < t*tile),
        # but their dofs can fall below x_start[t]; route those entries
        # to the sentinel zero row instead of a negative gather index.
        # In-tile elements are unaffected: the x window covers [lo, hi).
        src = dofs - x_start[t]
        gsource[t, : len(js)] = np.where(
            (src >= 0) & (src < win_dofs), src, win_dofs)
        # invert to per-dof entry lists (window-local flat entries)
        jj, ll = np.nonzero(inside)
        d_loc = local[jj, ll]
        o = np.argsort(d_loc, kind="stable")
        d_s = d_loc[o]
        ent = (jj * 6 + ll)[o].astype(np.int32)
        slot = np.arange(len(d_s)) - np.searchsorted(d_s, d_s, "left")
        gidx[t, d_s, slot] = ent
        gdeg[t] = np.bincount(d_s, minlength=tile)

    # window order: row j of elem_dofs_r is original element eorder[j]
    elem_dofs_r = np.zeros((E, 6), dtype=np.int32)
    elem_dofs_r[:ne] = edr_w

    stride = gw + 1
    pack_rows = _round_up(-(-tile * stride // 128), 8)
    acc_pack = np.zeros((T, pack_rows * 128), dtype=np.int32)
    flat_slots = np.arange(tile) * stride
    acc_pack[:, flat_slots] = gdeg
    for s in range(gw):
        acc_pack[:, flat_slots + 1 + s] = gidx[:, :, s]
    acc_pack = acc_pack.reshape(T, pack_rows, 128)

    return RCMPlan(to_rcm=to_rcm, from_rcm=from_rcm, eorder=eorder,
                   elem_dofs_r=elem_dofs_r, tile=tile,
                   win_elems=win_elems, e_start=e_start,
                   starget=starget, win_dofs=win_dofs, x_start=x_start,
                   gsource=gsource, gdeg=gdeg, gidx=gidx, gw=gw,
                   acc_pack=acc_pack, n_tiles=T, bandwidth=bandwidth)
