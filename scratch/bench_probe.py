"""Instrumented bench warmup: per-kernel compile times + cache hit/miss.

Replicates bench.py's warmup (mesh + one solve_sweep) with the jax
compiler/compilation_cache debug logs on, so each XLA compile's wall
time and each cache decision is visible.  nohup-run me; poll the log.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_debug_log_modules",
                  "jax._src.compiler,jax._src.compilation_cache,"
                  "jax._src.lru_cache")
jax.config.update("jax_explain_cache_misses", True)

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid

N_SWEEP = int(os.environ.get("BENCH_SWEEP", "8"))
MESH_MIN = int(os.environ.get("BENCH_MESH_MIN", "15000"))
REFINE = float(os.environ.get("BENCH_REF", "2.2"))
N_MODES = 10


def make_geom(wl_um):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl_um)


cfg = SimulationConfig(
    mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
    mesh=MeshConfig(bucket_rounding=1024),
    solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                        beta_passes=1))

from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

geom0 = make_geom(1.55)
t0 = time.time()
grid = MeshGenerator.generate(geom0, REFINE, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh: {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket} "
      f"({time.time()-t0:.1f}s)", flush=True)

wls = np.linspace(1.50, 1.64, N_SWEEP)
geoms = [make_geom(float(wl)) for wl in wls]

t0 = time.time()
sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
print(f"warmup total: {time.time()-t0:.1f}s  "
      f"phases={TrueVectorialMaxwellSolver.last_sweep_times}", flush=True)
print("modes per design:", [len(m) for m in sweep], flush=True)

t0 = time.time()
sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
dt = time.time() - t0
print(f"steady: {dt/N_SWEEP:.2f} s/design "
      f"phases={TrueVectorialMaxwellSolver.last_sweep_times}", flush=True)
