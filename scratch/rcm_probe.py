"""Measure RCM plan window sizes on bench-style meshes.

Usage: python scratch/rcm_probe.py [mesh_min ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.rcm import build_rcm_plan

sizes = [int(a) for a in sys.argv[1:]] or [2500, 8000]
for mm in sizes:
    cfg = SimulationConfig(mesh_min_points=mm, mesh_target_points=4 * mm,
                           mesh=MeshConfig(bucket_rounding=1024))
    g = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
    grid = MeshGenerator.generate(g, 0.7, cfg)
    dg = export_device_grid(grid, 1024)
    for tile in (128, 256, 512):
        t0 = time.time()
        plan = build_rcm_plan(dg, tile=tile)
        dt = time.time() - t0
        if plan is None:
            print(f"mesh_min={mm} tile={tile}: plan None")
            continue
        ws = plan.win_elems
        wx = plan.win_dofs
        # VMEM estimate for the A kernel at Lp lanes (f32):
        for Lp in (512, 640):
            buf = (6 * ws + 6 * ws + 7 * ws        # U, Ye, temps
                   + wx + (tile + 8)) * Lp * 4 / 1e6
            print(f"mesh_min={mm} ({grid.n_points} pts {grid.n_dofs} "
                  f"dofs) tile={tile}: bw={plan.bandwidth} "
                  f"win_elems={ws} win_dofs={wx} tiles={plan.n_tiles} "
                  f"Lp={Lp} vmem~{buf:.1f}MB  ({dt:.1f}s)")
