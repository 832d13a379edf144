"""cProfile a steady production solve_sweep call: attribute the ~19 s
per call that the PhaseTimer phases do not cover (tune_r3 binv=1 run:
total 49.2 s, phases 30.2 s)."""
import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

B = 8
cfg = SimulationConfig(
    mesh_min_points=15000, mesh_target_points=15000,
    mesh=MeshConfig(bucket_rounding=1024),
    solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                        beta_passes=1))
geom0 = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom0, 2.2, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs", flush=True)

wls = np.linspace(1.50, 1.64, B)
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in wls]

t0 = time.time()
TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
print(f"warmup {time.time()-t0:.1f}s", flush=True)

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
pr.disable()
dt = time.time() - t0
ph = dict(TrueVectorialMaxwellSolver.last_sweep_times)
print(f"steady total {dt:.1f}s, phases {sum(ph.values()):.1f}s, "
      f"untimed {dt-sum(ph.values()):.1f}s", flush=True)

s = io.StringIO()
st = pstats.Stats(pr, stream=s)
st.sort_stats("cumulative").print_stats(45)
print(s.getvalue())
s = io.StringIO()
st = pstats.Stats(pr, stream=s)
st.sort_stats("tottime").print_stats(30)
print(s.getvalue())
