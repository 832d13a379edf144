"""Matmul-window accumulate prototype (MXU segment-reduce).

The fused accumulate (gather-sum over split valence tables) measured
10.5 ms at sweep lanes (micro_r2.log) — ~48 ns/gathered-row, far under
HBM bandwidth: it is row-latency-bound. This prototypes the VECTOR
segment-reduce from STATUS_round2 "named wins" as pure XLA:

- elements sorted by min RCM dof; tile t of output dofs consumes a
  UNIFORM-STRIDE element window [t*stride - hl, t*stride + stride + hr)
  so window extraction is reshape+roll (contiguous), not a gather;
- per-tile accumulation is Y_t = S_t @ Ye_t on the MXU, where S_t is a
  0/1 selector (tile, win*6). bf16 selector entries are EXACT, and the
  MXU accumulates in f32, so splitting Ye hi/lo into two bf16 operands
  (Ye = hi + lo) makes the two-matmul sum f32-accurate: the only error
  is the lo residual's bf16 round, ~2^-16 relative.

Usage: python -u scratch/acc_mm.py [mesh_min] [B] [iters] [tile]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

MESH_MIN = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
TILE = int(sys.argv[4]) if len(sys.argv) > 4 else 256
K = 22

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.assembly import gather_scatter, grid_to_device
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.kernels import _accumulate_fused

cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 0.7, cfg)
dg = export_device_grid(grid, 1024)
ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
D = dg.n_dofs_padded
E = dg.elem_dofs.shape[0]
L = 3 * B * K
print(f"mesh {grid.n_dofs} dofs D={D} E={E} L={L} tile={TILE}", flush=True)

# ---- plan: RCM dof order, elements sorted by min rcm dof ------------
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

ed = np.asarray(dg.elem_dofs)                  # (E, 6), pads -> 0?
valid_e = np.asarray(dg.elem_valid, bool) if hasattr(dg, "elem_valid") \
    else np.ones(E, bool)
nv = dg.n_dofs
rows = np.repeat(np.arange(E), 6)
cols = ed.ravel()
ok = np.repeat(valid_e, 6) & (cols < nv)
A = sp.coo_matrix((np.ones(ok.sum()), (rows[ok], cols[ok])),
                  shape=(E, D)).tocsr()
G = (A.T @ A).tocsr()                          # dof adjacency
perm = np.asarray(reverse_cuthill_mckee(G, symmetric_mode=True))
# valid dofs first in rcm order, padded dofs last
isval = np.zeros(D, bool)
isval[:nv] = True
perm = np.concatenate([perm[isval[perm]], perm[~isval[perm]]])
to_rcm = perm.astype(np.int32)                 # X_rcm = X[to_rcm]
rank = np.empty(D, np.int64)
rank[to_rcm] = np.arange(D)

# elements sorted by min rcm dof (invalid elements last)
edr = rank[ed]                                 # (E, 6) rcm ids
emin = np.where(valid_e, edr.min(axis=1), 1 << 60)
eorder = np.argsort(emin, kind="stable").astype(np.int32)
edr_s = edr[eorder]                            # window-ordered
valid_s = valid_e[eorder]

T = (D + TILE - 1) // TILE
stride = (E + T - 1) // T
# halo: window for tile t must cover all elements touching its dofs
lo_need = np.full(T, np.iinfo(np.int64).max)
hi_need = np.full(T, -1)
for j in range(E):
    if not valid_s[j]:
        continue
    ts = edr_s[j] // TILE
    for t in np.unique(ts[edr_s[j] < nv]):
        lo_need[t] = min(lo_need[t], j)
        hi_need[t] = max(hi_need[t], j)
base_idx = np.arange(T) * stride
hl = int(max(0, (base_idx - lo_need)[hi_need >= 0].max()))
hr = int(max(0, (hi_need - (base_idx + stride - 1))[hi_need >= 0].max()))
WIN = stride + hl + hr
print(f"T={T} stride={stride} hl={hl} hr={hr} win={WIN} "
      f"(overlap x{WIN/stride:.2f})", flush=True)

# selector tensor S: (T, TILE, WIN*6) 0/1
S = np.zeros((T, TILE, WIN * 6), np.float32)
for t in range(T):
    a0 = t * stride - hl
    for jj in range(WIN):
        a = a0 + jj
        if a < 0 or a >= E or not valid_s[a]:
            continue
        for l in range(6):
            d = edr_s[a, l]
            if t * TILE <= d < (t + 1) * TILE and d < nv:
                S[t, d - t * TILE, jj * 6 + l] = 1.0
S_bf = jnp.asarray(S, jnp.bfloat16)
print(f"S: {S.nbytes/2**20:.0f} MB f32 ({S_bf.nbytes/2**20:.0f} MB bf16), "
      f"nnz {int(S.sum())} of {6*int(valid_s.sum())} entries", flush=True)

# map from original element order to window order for Ye
eorder_j = jnp.asarray(eorder)
from_rcm = np.empty(D, np.int64)
from_rcm[rank[np.arange(D)]] = np.arange(D)    # X = X_rcm[inv]
inv_rcm = jnp.asarray(np.argsort(rank).astype(np.int32))

rng = jax.random.PRNGKey(0)
Ye = jax.random.normal(rng, (E, 6, L), jnp.float32)


def acc_base(y):
    return _accumulate_fused(y, gs)


def acc_mm(y_w):
    """y_w: (E, 6, L) in WINDOW element order -> (D, L) rcm order."""
    flat = y_w.reshape(E * 6, L)
    pad = jnp.zeros(((T * stride - E) * 6, L), flat.dtype)
    Z = jnp.concatenate([flat, pad], 0).reshape(T, stride * 6, L)
    halo_chunks = (hl + hr + stride - 1) // stride
    parts = [Z]
    for c in range(1, halo_chunks + 1):
        parts.append(jnp.roll(Z, -c, axis=0))
    Wide = jnp.concatenate(parts, axis=1)      # (T, (1+hc)*stride*6, L)
    # shift so row 0 of the window is element t*stride - hl
    # rows [stride*6 - hl*6 ... ] -- implement by prepending the PREV
    # chunk's tail instead: roll +1 and take last hl*6 rows
    head = jnp.roll(Z, 1, axis=0)[:, (stride - hl) * 6:, :] if hl else \
        jnp.zeros((T, 0, L), flat.dtype)
    Wfull = jnp.concatenate([head, Wide], axis=1)[:, :WIN * 6, :]
    hi = Wfull.astype(jnp.bfloat16)
    lo = (Wfull - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    Yt = (jax.lax.dot_general(S_bf, hi, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(S_bf, lo, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32))
    return Yt.reshape(T * TILE, L)[:D]


jbase = jax.jit(acc_base)
jmm = jax.jit(acc_mm)

# parity: feed the SAME element data in both orders
Ye_w = Ye[eorder_j]
y0 = jax.block_until_ready(jbase(Ye))          # native dof order
y1 = jax.block_until_ready(jmm(Ye_w))          # rcm dof order
y1_native = y1[jnp.asarray(rank[np.arange(D)].astype(np.int32))]
# zero out padded/exterior rows in both before comparing valid dofs
err = float(jnp.abs(y0[:nv] - y1_native[:nv]).max()
            / (jnp.abs(y0[:nv]).max() + 1e-30))
print(f"mm vs base rel err: {err:.2e}", flush=True)
# hi/lo bf16 carries ~16 mantissa bits -> ~2^-16 relative; the f32
# filter's own apply-residual floor is ~3e-3, so this is noise there
assert err < 1e-4, err


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:24s} {dt:8.2f} ms", flush=True)
    return dt


tb = bench("accumulate (base)", jbase, Ye)
tm = bench("accumulate (mm win)", jmm, Ye_w)
print(f"speedup {tb / tm:.2f}x", flush=True)
print("DONE", flush=True)
