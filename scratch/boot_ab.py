"""Bootstrap-on vs bootstrap-off accuracy at production mesh (TPU)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.analytic import vector_modes
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

a, n1, n2 = 1.5, 1.535, 1.0
exact = vector_modes(1.55, a, n1, n2)
exact_deg = sorted((ne for lbl, ne in exact
                    for _ in range(2 if lbl.startswith("HY") else 1)),
                   reverse=True)
g = MCFGeometry(1, 8.0, a, n1, n2, wavelength_um=1.55)
for boot in (True, False):
    cfg = SimulationConfig(
        mesh_min_points=8000, mesh_target_points=32000,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=300,
                            cheb_passes=2, beta_passes=2,
                            bootstrap=boot))
    grid = MeshGenerator.generate(g, 0.7, cfg)
    dg = export_device_grid(grid, 1024)
    t0 = time.time()
    m = TrueVectorialMaxwellSolver(g, config=cfg).solve_vectorial_modes(
        dg, 8)
    dt = time.time() - t0
    ne = [x["n_eff"] for x in m[:6]]
    rel = [abs(ne[i]-exact_deg[i])/exact_deg[i] for i in range(len(ne))]
    print(f"boot={boot}: {grid.n_points} pts ({dt:.0f}s) "
          f"max rel err {max(rel):.2e}", flush=True)
    for i in range(len(ne)):
        print(f"  {ne[i]:.9f} vs {exact_deg[i]:.9f} rel {rel[i]:.2e}",
              flush=True)
print("BOOTABDONE", flush=True)
