"""Lumped-mass B^{-1} (binv_degree=0) vs Chebyshev B^{-1} (binv=4):
steady s/design, phase breakdown, truth-gated n_eff accuracy, mode
counts — production bench shapes.

Env: LP_BINV (default "4,0" comma list), LP_BP (default 1), LP_DEG
(default 200), LP_MESH (default 15000), LP_REF (default 2.2).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.analytic import vector_modes
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

BINVS = [int(x) for x in os.environ.get("LP_BINV", "4,0").split(",")]
BP = int(os.environ.get("LP_BP", "1"))
DEG = int(os.environ.get("LP_DEG", "200"))
MESH = int(os.environ.get("LP_MESH", "15000"))
REF = float(os.environ.get("LP_REF", "2.2"))
B = 8
N_MODES = 10


def make_geom(wl):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl)


geom0 = make_geom(1.55)
cfg0 = SimulationConfig(mesh_min_points=MESH, mesh_target_points=MESH,
                        mesh=MeshConfig(bucket_rounding=1024))
grid = MeshGenerator.generate(geom0, REF, cfg0)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket}",
      flush=True)

wls = np.linspace(1.50, 1.64, B)
geoms = [make_geom(float(w)) for w in wls]

for binv in BINVS:
    cfg = SimulationConfig(
        mesh_min_points=MESH, mesh_target_points=MESH,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=DEG, cheb_passes=2,
                            beta_passes=BP, binv_degree=binv))
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    print(f"[binv={binv}] warmup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    dt = time.time() - t0
    ph = dict(TrueVectorialMaxwellSolver.last_sweep_times)
    print(f"[binv={binv}] steady {dt/B:.2f} s/design (total {dt:.1f}s)",
          flush=True)
    for k, v in sorted(ph.items(), key=lambda kv: -kv[1]):
        print(f"    {k:12s} {v:7.2f}s")
    errs = []
    for g, ms in zip(geoms, sweep):
        exact = vector_modes(g.wavelength, 1.5, 1.535, 1.0, nu_max=1)
        he11 = max(n for lbl, n in exact)
        errs.append(abs(ms[0]["n_eff"] - he11) / he11)
    print(f"[binv={binv}] bp={BP} deg={DEG}: rel n_eff err "
          f"max={max(errs):.2e} med={np.median(errs):.2e}  modes "
          f"{[len(m) for m in sweep]}", flush=True)
