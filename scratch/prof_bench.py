"""Phase profile of the bench config (60k-DOF band)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

cfg = SimulationConfig(
    mesh_min_points=15000, mesh_target_points=15000,
    mesh=MeshConfig(bucket_rounding=1024),
    solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                        beta_passes=1))
g0 = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(g0, 2.2, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs", flush=True)
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in np.linspace(1.50, 1.64, 8)]
res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
t0 = time.time()
res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
dt = time.time() - t0
ph = dict(TrueVectorialMaxwellSolver.last_sweep_times)
print(f"{dt/8:.2f} s/design; phases: " +
      " ".join(f"{k}={v:.1f}" for k, v in
               sorted(ph.items(), key=lambda x: -x[1])), flush=True)
print("PROFDONE", flush=True)
