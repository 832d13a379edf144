"""Block-partitioned duplicated-element MXU accumulate prototype.

Replaces the gather-sum accumulate (measured 10.5 ms at sweep lanes,
~48 ns/gathered-row latency-bound; micro_r2.log) with ONE batched
matmul and no per-row addressing at all:

- KD-bisect the valid dofs (coords) into NB blocks of <= TILE dofs;
  the recurrence runs with dofs in block-major order.
- Duplicate each element into every block its 6 dofs touch (~1.2x) and
  pad per-block element groups to a uniform count; the APPLY computes
  on the duplicated element array (pad slots are zero-weight).
- Accumulate: Y[b] = S[b] @ Ye[b] where S[b] is the (TILE, cnt*6) 0/1
  in-block selector. bf16 selector entries are exact and the MXU
  accumulates f32, so an hi/lo bf16 split of Ye gives ~2^-16 accuracy
  (the f32 filter's own apply-residual floor is ~3e-3).

Usage: python -u scratch/acc_blk.py [mesh_min] [B] [iters] [tile]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

MESH_MIN = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
TILE = int(sys.argv[4]) if len(sys.argv) > 4 else 256
K = 22

import jax
import jax.numpy as jnp

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.assembly import gather_scatter, grid_to_device
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.kernels import _accumulate_fused

cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 2.2 if MESH_MIN >= 12000 else 0.7, cfg)
dg = export_device_grid(grid, 1024)
ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
D = dg.n_dofs_padded
E = dg.elem_dofs.shape[0]
L = 3 * B * K
nv = dg.n_dofs
print(f"mesh {grid.n_dofs} dofs D={D} E={E} L={L} tile={TILE}", flush=True)

ed = np.asarray(dg.elem_dofs)
valid_e = np.asarray(dg.elem_valid, bool)
coords = np.asarray(dg.dof_coords)[:nv]

# ---- KD bisection into blocks of <= TILE dofs ------------------------
t0 = time.time()
blocks = []


def split(idx):
    if len(idx) <= TILE:
        blocks.append(idx)
        return
    c = coords[idx]
    ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
    med = np.argsort(c[:, ax], kind="stable")
    h = len(idx) // 2
    split(idx[med[:h]])
    split(idx[med[h:]])


split(np.arange(nv))
NB = len(blocks)
TILEP = max(len(b) for b in blocks)
TILEP = (TILEP + 7) // 8 * 8
Dblk = NB * TILEP
# block-major dof order; rank_blk[dof] = position in block layout
rank_blk = np.full(nv, -1, np.int64)
for bi, idx in enumerate(blocks):
    rank_blk[idx] = bi * TILEP + np.arange(len(idx))
print(f"kd: NB={NB} TILEP={TILEP} Dblk={Dblk} (D={D}) "
      f"({time.time()-t0:.1f}s)", flush=True)

# ---- duplicated element groups per block -----------------------------
ev = np.where(valid_e)[0]
edv = ed[ev]                                    # (Ev, 6) native dofs
blk_of = rank_blk[edv] // TILEP                 # (Ev, 6)
pairs = set()
for j in range(len(ev)):
    for t in np.unique(blk_of[j]):
        pairs.add((int(t), int(ev[j])))
pairs = np.array(sorted(pairs), np.int64)       # (P, 2) block, elem
P = len(pairs)
cnt = np.bincount(pairs[:, 0], minlength=NB)
CNT = int(cnt.max())
CNT = (CNT + 7) // 8 * 8
dup = P / len(ev)
print(f"dup x{dup:.3f}  cnt max={cnt.max()} pad={CNT} "
      f"slots={NB*CNT} (x{NB*CNT/len(ev):.2f} of valid E)", flush=True)

# element-slot source table + selector tensor
e_src = np.zeros((NB, CNT), np.int64)           # source element id
S = np.zeros((NB, TILEP, CNT * 6), np.float32)
pos = np.zeros(NB, np.int64)
for t, e in pairs:
    j = pos[t]
    pos[t] = j + 1
    e_src[t, j] = e
    for l in range(6):
        r = rank_blk[ed[e, l]]
        if r // TILEP == t:
            S[t, r - t * TILEP, j * 6 + l] = 1.0
S_bf = jnp.asarray(S, jnp.bfloat16)
print(f"S: {S_bf.nbytes/2**20:.0f} MB bf16; "
      f"mm FLOP {2*2*NB*TILEP*CNT*6*L/1e9:.0f} GFLOP", flush=True)

rng = jax.random.PRNGKey(0)
Ye = jax.random.normal(rng, (E, 6, L), jnp.float32)
e_src_j = jnp.asarray(e_src)


def acc_base(y):
    return _accumulate_fused(y, gs)


def to_blk_groups(y):
    """(E, 6, L) element Ye -> (NB, CNT*6, L) block groups (prototype
    gather; production bakes duplication into the element array)."""
    return y[e_src_j].reshape(NB, CNT * 6, L)


def acc_blk(yb):
    hi = yb.astype(jnp.bfloat16)
    lo = (yb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    Yt = (jax.lax.dot_general(S_bf, hi, dn,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(S_bf, lo, dn,
                                preferred_element_type=jnp.float32))
    return Yt.reshape(NB * TILEP, L)


jbase = jax.jit(acc_base)
jblk = jax.jit(acc_blk)
jgrp = jax.jit(to_blk_groups)

Yb = jax.block_until_ready(jgrp(Ye))
y0 = np.asarray(jbase(Ye))                      # native order (D, L)
y1 = np.asarray(jblk(Yb))                       # block order (Dblk, L)
# compare on valid dofs
err = np.abs(y0[:nv] - y1[rank_blk]).max() / (np.abs(y0[:nv]).max() + 1e-30)
print(f"blk vs base rel err: {err:.2e}", flush=True)
assert err < 1e-4, err


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:26s} {dt:8.2f} ms", flush=True)
    return dt


tb = bench("accumulate (base)", jbase, Ye)
tm = bench("accumulate (blk mm)", jblk, Yb)
tg = bench("group gather (proto only)", jgrp, Ye)
print(f"speedup (mm only) {tb / tm:.2f}x", flush=True)
print("DONE", flush=True)
