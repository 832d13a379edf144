"""Round-2 tuning: end-to-end solve_sweep timing across knob settings.

Usage: nohup python -u scratch/tune_r2.py > /tmp/tune_r2.log 2>&1 &
Env: TUNE_MESH_MIN (default 2500), TUNE_SWEEP (default 8).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

MESH_MIN = int(os.environ.get("TUNE_MESH_MIN", "2500"))
N_SWEEP = int(os.environ.get("TUNE_SWEEP", "8"))
N_MODES = 10

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver


def make_geom(wl):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl)


cfg0 = SimulationConfig(mesh_min_points=MESH_MIN,
                        mesh_target_points=4 * MESH_MIN,
                        mesh=MeshConfig(bucket_rounding=1024))
geom0 = make_geom(1.55)
grid = MeshGenerator.generate(geom0, 0.7, cfg0)
dg = export_device_grid(grid, 1024)
print(f"mesh: {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket}",
      flush=True)
wls = np.linspace(1.50, 1.64, N_SWEEP)
geoms = [make_geom(float(w)) for w in wls]

CASES = [
    ("r1-equivalent (no boot, binv4, bp1)",
     dict(bootstrap=False, binv_degree=4, beta_passes=1, cheb_passes=2)),
    ("boot+binv4", dict(bootstrap=True, binv_degree=4, beta_passes=2)),
    ("boot+binv2", dict(bootstrap=True, binv_degree=2, beta_passes=2)),
    ("boot+binv1", dict(bootstrap=True, binv_degree=1, beta_passes=2)),
]

for name, kw in CASES:
    cfg = SimulationConfig(
        mesh_min_points=MESH_MIN, mesh_target_points=4 * MESH_MIN,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=300, **kw))
    # warmup (compile)
    t0 = time.time()
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    warm = time.time() - t0
    t0 = time.time()
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    dt = time.time() - t0
    nm = [len(m) for m in res]
    ne = res[0][0]["n_eff"] if res[0] else -1
    ne_last = res[-1][0]["n_eff"] if res[-1] else -1
    print(f"{name:45s} warm={warm:6.1f}s run={dt:6.2f}s "
          f"({dt / N_SWEEP:5.2f} s/design) modes={nm} "
          f"n_eff[0]={ne:.6f} n_eff[-1]={ne_last:.6f}", flush=True)

print("DONE", flush=True)
