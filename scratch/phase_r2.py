"""Phase breakdown of solve_sweep at bench size (uses last_sweep_times).

Usage: nohup python -u scratch/phase_r2.py > /tmp/phase_r2.log 2>&1 &
Env: PHASE_MESH_MIN (default 8000), PHASE_SWEEP (default 8).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import logging

logging.basicConfig(level=logging.DEBUG,
                    format="%(asctime)s %(name)s %(message)s")
for noisy in ("jax", "matplotlib"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

import numpy as np

MESH_MIN = int(os.environ.get("PHASE_MESH_MIN", "8000"))
N_SWEEP = int(os.environ.get("PHASE_SWEEP", "8"))
N_MODES = 10

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver


def make_geom(wl):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl)


cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024),
                       solver=SolverConfig(backend="tpu", cheb_degree=300,
                                           cheb_passes=2, beta_passes=1))
geom0 = make_geom(1.55)
grid = MeshGenerator.generate(geom0, 0.7, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh: {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket}",
      flush=True)
wls = np.linspace(1.50, 1.64, N_SWEEP)
geoms = [make_geom(float(w)) for w in wls]

for it in range(2):
    t0 = time.time()
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    dt = time.time() - t0
    times = TrueVectorialMaxwellSolver.last_sweep_times
    nm = [len(m) for m in res]
    tag = "warmup" if it == 0 else "steady"
    print(f"{tag}: {dt:.2f}s total ({dt / N_SWEEP:.2f} s/design) "
          f"modes={nm}", flush=True)
    tot = sum(times.values())
    for kk, vv in sorted(times.items(), key=lambda x: -x[1]):
        print(f"   {kk:12s} {vv:8.2f}s  ({100 * vv / tot:4.1f}%)", flush=True)
print("DONE", flush=True)
