"""Convergence-to-exact probe: scalar and vector solvers vs analytic.

Usage: python -u scratch/conv_probe.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.analytic import lp_modes, vector_modes
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import ScalarHelmholtzSolver, TrueVectorialMaxwellSolver

CASES = [
    ("a1.3_n1.53", 1.3, 1.53),
    ("a1.5_n1.535", 1.5, 1.535),
]
for name, a, n1 in CASES:
    g = MCFGeometry(1, 8.0, a, n1, 1.0, wavelength_um=1.55)
    ex_vec = max(ne for lbl, ne in vector_modes(1.55, a, n1, 1.0))
    V = 2 * np.pi / 1.55 * a * np.sqrt(n1**2 - 1.0)
    ex_lp = max(t[2] for t in lp_modes(V, n1, 1.0))
    for mm in (2000, 8000):
        cfg = SimulationConfig(
            mesh_min_points=mm, mesh_target_points=4 * mm,
            mesh=MeshConfig(bucket_rounding=1024),
            solver=SolverConfig(backend="tpu", cheb_degree=300,
                                cheb_passes=2, beta_passes=1))
        grid = MeshGenerator.generate(g, 0.7, cfg)
        dg = export_device_grid(grid, 1024)
        mv = TrueVectorialMaxwellSolver(g, config=cfg) \
            .solve_vectorial_modes(dg, 6)
        ms = ScalarHelmholtzSolver(g, cfg).solve(dg, 4)
        nv = mv[0]["n_eff"] if mv else float("nan")
        ns = ms[0]["n_eff"] if ms else float("nan")
        print(f"{name} mesh={grid.n_points}: vec={nv:.8f} "
              f"(exact {ex_vec:.8f}, err {nv-ex_vec:+.2e})  "
              f"lp01={ns:.8f} (exact {ex_lp:.8f}, err {ns-ex_lp:+.2e})",
              flush=True)
print("CONVDONE", flush=True)
