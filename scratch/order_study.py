"""DOF-ordering study for the matmul-window accumulate.

The MXU segment-reduce's FLOP cost scales with the element-window
overlap 1 + bandwidth/TILE, so the viable design needs an ordering
whose P2-dof 'element spread' (max dof - min dof per element) is small.
Compares RCM, x-sort, and Morton (Z-curve) orderings at production
mesh scale and prints the per-tile window stats each would give.

Usage: python -u scratch/order_study.py [mesh_min] [tile]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

MESH_MIN = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 256

import jax

jax.config.update("jax_platforms", "cpu")

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid

cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
t0 = time.time()
grid = MeshGenerator.generate(geom, 2.2 if MESH_MIN >= 12000 else 0.7, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs "
      f"({time.time()-t0:.0f}s)", flush=True)

ed = np.asarray(dg.elem_dofs)
valid_e = np.asarray(dg.elem_valid, bool)
nv = dg.n_dofs
D = dg.n_dofs_padded
E = ed.shape[0]
Ev = int(valid_e.sum())
coords = np.asarray(dg.dof_coords)[:nv]


def stats(name, rank_valid):
    """rank_valid: (nv,) position of each valid dof in the ordering."""
    r = rank_valid[ed[valid_e]]                  # (Ev, 6)
    spread = r.max(axis=1) - r.min(axis=1)
    emin = r.min(axis=1)
    order = np.argsort(emin, kind="stable")
    emin_s = emin[order]
    # window stats for TILE-dof tiles, uniform element stride
    T = (nv + TILE - 1) // TILE
    stride = (Ev + T - 1) // T
    # elements touching tile t: min rank in (t*TILE - spread, (t+1)*TILE)
    lo_need = np.full(T, np.iinfo(np.int64).max)
    hi_need = np.full(T, -1)
    rs = r[order]
    tlo = rs.min(axis=1) // TILE
    thi = rs.max(axis=1) // TILE
    for j in range(Ev):
        for t in range(tlo[j], thi[j] + 1):
            if lo_need[t] > j:
                lo_need[t] = j
            if hi_need[t] < j:
                hi_need[t] = j
    base = np.arange(T) * stride
    ok = hi_need >= 0
    hl = int(max(0, (base - lo_need)[ok].max()))
    hr = int(max(0, (hi_need - (base + stride - 1))[ok].max()))
    win = stride + hl + hr
    # FLOP model: 2 (hi/lo) * 2 * D * win*6/stride_ratio ... report raw
    win6 = win * 6
    L = 528.0
    gflop = 2 * 2 * T * TILE * win6 * L / 1e9
    s_mb = T * TILE * win6 * 2 / 2**20
    print(f"{name:10s} spread p50/p95/max {int(np.percentile(spread,50)):5d}"
          f"/{int(np.percentile(spread,95)):5d}/{spread.max():6d}  "
          f"tile={TILE} stride={stride} hl={hl} hr={hr} win={win} "
          f"(x{win/stride:.2f})  mm: {gflop:.0f} GFLOP, S {s_mb:.0f} MB",
          flush=True)
    return spread


# 1) RCM over the P2 dof graph
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

rows = np.repeat(np.arange(E), 6)
cols = ed.ravel()
ok = np.repeat(valid_e, 6) & (cols < nv)
A = sp.coo_matrix((np.ones(ok.sum()), (rows[ok], cols[ok])),
                  shape=(E, nv)).tocsr()
G = (A.T @ A).tocsr()
t0 = time.time()
perm = np.asarray(reverse_cuthill_mckee(G, symmetric_mode=True))
rank = np.empty(nv, np.int64)
rank[perm] = np.arange(nv)
print(f"rcm built ({time.time()-t0:.0f}s)", flush=True)
stats("rcm", rank)

# 2) x-sort
xr = np.argsort(coords[:, 0], kind="stable")
rank_x = np.empty(nv, np.int64)
rank_x[xr] = np.arange(nv)
stats("x-sort", rank_x)

# 3) Morton (Z-order) on quantized coords
q = 1 << 12
xy = coords - coords.min(axis=0)
xy = (xy / (xy.max() + 1e-30) * (q - 1)).astype(np.uint64)


def interleave(v):
    v = v & 0xFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


code = interleave(xy[:, 0]) | (interleave(xy[:, 1]) << np.uint64(1))
mr = np.argsort(code, kind="stable")
rank_m = np.empty(nv, np.int64)
rank_m[mr] = np.arange(nv)
stats("morton", rank_m)

# 4) Hilbert-ish: Morton with gray-coded x (cheap proxy); plus y-sort
yr = np.argsort(coords[:, 1], kind="stable")
rank_y = np.empty(nv, np.int64)
rank_y[yr] = np.arange(nv)
stats("y-sort", rank_y)
print("DONE", flush=True)
