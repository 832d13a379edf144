"""Block-partitioned duplicated-element accumulate plan (MXU path).

The fused applies' accumulate (gather-sum over bounded-valence tables,
kernels.py `_accumulate_fused`) measured ~48 ns/gathered-row at sweep
lanes — row-LATENCY-bound at ~10.5 ms/apply, far under HBM bandwidth
(micro_r2.log; scratch/pallas_acc.py showed Pallas row loops are no
better). This module removes per-row addressing from the accumulate
entirely:

- KD-bisect the valid dofs by coordinates into NB blocks of <= tile
  dofs; the filter recurrence runs with dofs in block-major order
  (the permutation is applied once per `solve_lowest_sweep` call).
- Duplicate each element into every block its 6 dofs touch (~1.2-1.5x
  slots) and pad per-block groups to a uniform count. Pad slots carry
  zero quadrature weight, so the applies' element math zeroes them.
- The accumulate becomes ONE batched matmul per apply:
  Y[b] = S[b] @ Ye[b], with S[b] the (tile, cnt*6) 0/1 in-block
  selector. bf16 selector entries are exact and the MXU accumulates in
  f32, so an hi/lo bf16 split of Ye keeps ~2^-16 relative accuracy
  (the f32 filter's own apply-residual floor is ~3e-3).

Enabled via PL_FEM_ACC=blk (vectorial solve_sweep assemble phase).
Correctness is pinned by tests/test_kernels.py; the TPU A/B lives in
scratch/acc_blk.py. No reference analog: the reference hands assembled
CSR to ARPACK and never controls data movement
(/root/reference/solver_fem.py:196-197).
"""
from __future__ import annotations

import dataclasses
import weakref
from typing import Optional

import numpy as np


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass
class BlockPlan:
    """Host-side tables; device views built once per plan."""

    tile: int
    nb: int                  # number of dof blocks
    tilep: int               # padded dofs per block (block stride)
    cnt: int                 # padded element slots per block
    to_blk: np.ndarray       # (nb*tilep,) int32 native dof row per block row
    blk_valid: np.ndarray    # (nb*tilep,) bool
    from_blk: np.ndarray     # (Dp,) int32 block row per native dof row
    nat_valid: np.ndarray    # (Dp,) bool
    slot_src: np.ndarray     # (nb*cnt,) int32 source element per slot
    slot_valid: np.ndarray   # (nb*cnt,) bool
    elem_dofs_blk: np.ndarray  # (nb*cnt, 6) int32 block-row dof ids
    S: np.ndarray            # (nb, tilep, cnt*6) f32 0/1 selector

    def device_tables(self):
        """BlkTables for the kernels (bf16 selector)."""
        import jax.numpy as jnp

        from .kernels import BlkTables

        if self._dev is None:
            self._dev = BlkTables(
                elem_dofs=jnp.asarray(self.elem_dofs_blk),
                S=jnp.asarray(self.S, jnp.bfloat16))
        return self._dev

    def device_perms(self):
        """(to_blk, blk_valid, from_blk, nat_valid) as device arrays."""
        import jax.numpy as jnp

        if self._perms is None:
            self._perms = (jnp.asarray(self.to_blk),
                           jnp.asarray(self.blk_valid),
                           jnp.asarray(self.from_blk),
                           jnp.asarray(self.nat_valid))
        return self._perms

    def __post_init__(self):
        self._dev = None
        self._perms = None


def build_block_plan(dg, tile: int = 256) -> Optional[BlockPlan]:
    """Build the block accumulate plan for a DeviceGrid (host numpy)."""
    ed = np.asarray(dg.elem_dofs)
    valid_e = np.asarray(dg.elem_valid, bool)
    nv = int(dg.n_dofs)
    Dp = dg.n_dofs_padded
    coords = np.asarray(dg.dof_coords)[:nv]

    # KD bisection of valid dofs into blocks of <= tile
    blocks = []

    def split(idx):
        if len(idx) <= tile:
            blocks.append(idx)
            return
        c = coords[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        med = np.argsort(c[:, ax], kind="stable")
        h = len(idx) // 2
        split(idx[med[:h]])
        split(idx[med[h:]])

    split(np.arange(nv))
    nb = len(blocks)
    tilep = _round_up(max(len(b) for b in blocks), 8)
    dblk = nb * tilep

    rank_blk = np.full(nv, -1, np.int64)
    to_blk = np.zeros(dblk, np.int32)
    blk_valid = np.zeros(dblk, bool)
    for bi, idx in enumerate(blocks):
        rows = bi * tilep + np.arange(len(idx))
        rank_blk[idx] = rows
        to_blk[rows] = idx
        blk_valid[rows] = True
    from_blk = np.zeros(Dp, np.int32)
    from_blk[to_blk[blk_valid]] = np.where(blk_valid)[0].astype(np.int32)
    nat_valid = np.zeros(Dp, bool)
    nat_valid[:nv] = True

    # (block, element) incidence pairs, vectorized
    ev = np.where(valid_e)[0]
    if len(ev) == 0:
        return None
    blk6 = np.sort(rank_blk[ed[ev]] // tilep, axis=1)      # (Ev, 6)
    keep = np.concatenate(
        [np.ones((len(ev), 1), bool), np.diff(blk6, axis=1) != 0], axis=1)
    p_blk = blk6[keep]
    p_elem = np.repeat(ev, keep.sum(axis=1))
    order = np.argsort(p_blk, kind="stable")
    p_blk, p_elem = p_blk[order], p_elem[order]

    counts = np.bincount(p_blk, minlength=nb)
    cnt = _round_up(int(counts.max()), 8)
    slots = nb * cnt

    slot_src = np.zeros(slots, np.int32)
    slot_valid = np.zeros(slots, bool)
    within = np.arange(len(p_blk)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    slot_ids = p_blk * cnt + within
    slot_src[slot_ids] = p_elem.astype(np.int32)
    slot_valid[slot_ids] = True

    # per-slot dof rows; pad slots -> row 0 (their weights are zero)
    edb = np.where(slot_valid[:, None],
                   rank_blk[ed[slot_src]], 0).astype(np.int32)

    # selector: S[b, row - b*tilep, (slot%cnt)*6 + l] = 1 for in-block
    S = np.zeros((nb, tilep, cnt * 6), np.float32)
    sj = np.repeat(np.arange(slots), 6)
    sl = np.tile(np.arange(6), slots)
    d = edb.ravel()
    t = sj // cnt
    inblk = slot_valid[sj] & (d // tilep == t) & blk_valid[d]
    S[t[inblk], d[inblk] - t[inblk] * tilep,
      (sj[inblk] % cnt) * 6 + sl[inblk]] = 1.0

    return BlockPlan(tile=tile, nb=nb, tilep=tilep, cnt=cnt,
                     to_blk=to_blk, blk_valid=blk_valid,
                     from_blk=from_blk, nat_valid=nat_valid,
                     slot_src=slot_src, slot_valid=slot_valid,
                     elem_dofs_blk=edb, S=S)


_PLAN_CACHE: dict = {}


def get_block_plan(dg, tile: int = 256) -> Optional[BlockPlan]:
    """Per-grid cached plan (the build is a few host seconds)."""
    key = id(dg)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        ref, plan = hit
        if ref() is dg and plan.tile == tile:
            return plan
    if len(_PLAN_CACHE) > 8:
        _PLAN_CACHE.clear()
    plan = build_block_plan(dg, tile)
    if plan is not None:
        try:
            _PLAN_CACHE[key] = (weakref.ref(dg), plan)
        except TypeError:
            pass
    return plan


def expand_qs(qs, plan: BlockPlan):
    """Slot-expanded QFactorSweep (pad slots get zero weight)."""
    import jax.numpy as jnp

    src = jnp.asarray(plan.slot_src)
    wvalid = jnp.asarray(plan.slot_valid, qs.w.dtype)[:, None]
    return type(qs)(invJT=qs.invJT[src], w=qs.w[src] * wvalid,
                    inv_eps=qs.inv_eps[:, src], gp=qs.gp[src])
