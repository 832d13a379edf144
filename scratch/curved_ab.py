"""Curved-vs-straight interface accuracy at production mesh (TPU).

Usage: python -u scratch/curved_ab.py [mesh_min]
"""
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

MESH = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
exact = vector_modes(1.55, 1.5, 1.535, 1.0)
exact_deg = sorted((ne for lbl, ne in exact
                    for _ in range(2 if lbl.startswith("HY") else 1)),
                   reverse=True)
g = MCFGeometry(1, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
for curved in (False, True):
    cfg = SimulationConfig(
        mesh_min_points=MESH, mesh_target_points=4 * MESH,
        mesh=MeshConfig(bucket_rounding=1024, curved_interfaces=curved),
        solver=SolverConfig(backend="tpu", cheb_degree=300,
                            cheb_passes=2, beta_passes=1))
    MeshGenerator.clear_cache()
    grid = MeshGenerator.generate(g, 0.7, cfg)
    dg = export_device_grid(grid, 1024)
    t0 = time.time()
    m = TrueVectorialMaxwellSolver(g, config=cfg).solve_vectorial_modes(
        dg, 8)
    dt = time.time() - t0
    ne = [x["n_eff"] for x in m[:6]]
    rel = [abs(ne[i] - exact_deg[i]) / exact_deg[i]
           for i in range(min(6, len(ne)))]
    print(f"curved={curved}: {grid.n_points} pts {grid.n_dofs} dofs "
          f"({dt:.0f}s)", flush=True)
    for i, (n, r) in enumerate(zip(ne, rel)):
        print(f"  mode {i}: {n:.9f} exact {exact_deg[i]:.9f} "
              f"rel {r:.2e}", flush=True)
    print(f"  max rel err: {max(rel):.2e}", flush=True)
print("ABDONE", flush=True)
