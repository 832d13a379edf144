#!/usr/bin/env python
"""Measure the ARPACK (hybrid/reference-algorithm) baseline at the
production bench mesh on THIS host's CPU, independent of the TPU.

Feeds the stored-baseline fallback in bench.py: when the scored bench
child dies before its live baseline loop (the r02/r03 failure mode),
the parent still reports vs_baseline against this measured number.

Usage: python scratch/baseline_prod.py [mesh_min] [refine] [n_designs]
Writes JSON to docs/BASELINE_HOST.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # axon hangs during outage

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

MESH_MIN = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
REFINE = float(sys.argv[2]) if len(sys.argv) > 2 else 2.2
N_DESIGNS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
N_MODES = 10


def make_geom(wl_um):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl_um)


cfg_base = SimulationConfig(
    mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
    mesh=MeshConfig(bucket_rounding=1024),
    solver=SolverConfig(backend="hybrid"))

geom0 = make_geom(1.55)
t0 = time.time()
grid = MeshGenerator.generate(geom0, REFINE, cfg_base)
dg = export_device_grid(grid, 1024)
print(f"mesh: {grid.n_points} pts {grid.n_dofs} dofs "
      f"({time.time() - t0:.1f}s)", flush=True)

wls = np.linspace(1.50, 1.64, 8)[:N_DESIGNS]
times = []
for wl in wls:
    g = make_geom(float(wl))
    t0 = time.time()
    modes = TrueVectorialMaxwellSolver(g, config=cfg_base) \
        .solve_vectorial_modes(dg, N_MODES)
    dt = time.time() - t0
    times.append(dt)
    print(f"wl={wl:.3f}: {dt:.1f}s, {len(modes)} modes, "
          f"n_eff_max={modes[0]['n_eff']:.6f}" if modes else
          f"wl={wl:.3f}: {dt:.1f}s, 0 modes", flush=True)

per_design = float(np.mean(times))
out = {
    "metric": "arpack_baseline_per_design_s",
    "per_design_s": round(per_design, 2),
    "designs_per_hour": round(3600.0 / per_design, 2),
    "mesh_points": grid.n_points,
    "n_dofs": grid.n_dofs,
    "mesh_min": MESH_MIN,
    "refine": REFINE,
    "n_designs": N_DESIGNS,
    "host": "1-core CPU VM (bench host)",
    "measured": "2026-08-18",
}
Path("docs/BASELINE_HOST.json").write_text(json.dumps(out, indent=1))
print(json.dumps(out), flush=True)
