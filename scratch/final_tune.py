"""Final bench-config tuning: accuracy (1-core vs exact) + sweep cost."""
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
g1 = MCFGeometry(1, 8.0, a, n1, n2, wavelength_um=1.55)

def cfg_of(deg, bp):
    return SimulationConfig(
        mesh_min_points=8000, mesh_target_points=32000,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=deg,
                            cheb_passes=2, beta_passes=bp,
                            bootstrap=True))

for deg, bp in ((200, 2), (300, 2)):
    cfg = cfg_of(deg, bp)
    grid = MeshGenerator.generate(g1, 0.7, cfg)
    dg = export_device_grid(grid, 1024)
    t0 = time.time()
    m = TrueVectorialMaxwellSolver(g1, config=cfg) \
        .solve_vectorial_modes(dg, 8)
    dt = time.time() - t0
    ne = [x["n_eff"] for x in m[:6]]
    rel = max(abs(ne[i]-exact_deg[i])/exact_deg[i] for i in range(len(ne)))
    print(f"1core deg={deg} bp={bp}: max rel err {rel:.2e} ({dt:.0f}s)",
          flush=True)

g0 = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
for deg, bp in ((200, 2), (300, 2), (200, 1)):
    cfg = cfg_of(deg, bp)
    grid = MeshGenerator.generate(g0, 0.7, cfg)
    dg = export_device_grid(grid, 1024)
    geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
             for w in np.linspace(1.50, 1.64, 8)]
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
    t0 = time.time()
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
    dt = time.time() - t0
    print(f"sweep deg={deg} bp={bp}: {dt/8:.2f} s/design "
          f"n_eff0={res[0][0]['n_eff']:.8f}", flush=True)
print("FTDONE", flush=True)
