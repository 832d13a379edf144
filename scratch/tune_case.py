"""One tuning case of the packed sweep at bench size.

Env: CASE_MESH_MIN (8000), CASE_SWEEP (8), CASE_BINV (4), CASE_DEGREE
(300), CASE_BACKEND (tpu|hybrid), PL_FEM_FILTER_PRECISION (highest).
Prints one summary line; run via scratch/tune_all.sh.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

MESH_MIN = int(os.environ.get("CASE_MESH_MIN", "8000"))
N_SWEEP = int(os.environ.get("CASE_SWEEP", "8"))
BINV = int(os.environ.get("CASE_BINV", "4"))
DEGREE = int(os.environ.get("CASE_DEGREE", "300"))
BACKEND = os.environ.get("CASE_BACKEND", "tpu")
N_MODES = 10

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver


def make_geom(wl):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl)


GOLDEN = os.environ.get("CASE_GOLDEN") == "1"
cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024),
                       solver=SolverConfig(backend=BACKEND,
                                           cheb_degree=DEGREE,
                                           binv_degree=BINV,
                                           cheb_passes=3 if GOLDEN else 2,
                                           beta_passes=2 if GOLDEN else 1,
                                           bootstrap=not GOLDEN))
geom0 = make_geom(1.55)
grid = MeshGenerator.generate(geom0, 0.7, cfg)
dg = export_device_grid(grid, 1024)
wls = np.linspace(1.50, 1.64, N_SWEEP)
geoms = [make_geom(float(w)) for w in wls]

tag = (f"{BACKEND} deg={DEGREE} binv={BINV} "
       f"prec={os.environ.get('PL_FEM_FILTER_PRECISION', 'highest')}")

if BACKEND == "hybrid":
    t0 = time.time()
    modes = TrueVectorialMaxwellSolver(geoms[0], config=cfg) \
        .solve_vectorial_modes(dg, N_MODES)
    dt = time.time() - t0
    ne = [f"{m['n_eff']:.8f}" for m in modes[:4]]
    print(f"CASE {tag}: {dt:.2f} s/design (1 design) n_eff={ne}",
          flush=True)
else:
    t0 = time.time()
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    warm = time.time() - t0
    t0 = time.time()
    res = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    dt = time.time() - t0
    times = dict(TrueVectorialMaxwellSolver.last_sweep_times)
    nm = [len(m) for m in res]
    ne = [f"{m['n_eff']:.8f}" for m in res[0][:4]]
    ph = " ".join(f"{k}={v:.1f}" for k, v in
                  sorted(times.items(), key=lambda x: -x[1]))
    print(f"CASE {tag}: warm={warm:.1f}s run={dt:.2f}s "
          f"({dt / N_SWEEP:.2f} s/design) modes={nm}\n"
          f"  n_eff[0]={ne}\n  phases: {ph}", flush=True)
