"""Round-3 perf tuning: filter cost vs (binv_degree, degree) at the
production bench bucket, with truth-gated accuracy per variant.

Env knobs: TUNE_BINV (default 4), TUNE_DEG (default 200), TUNE_BP
(beta_passes, default 1), TUNE_SWEEP (default 8), TUNE_MESH (default
15000), TUNE_REF (default 2.2).

Prints: phase breakdown of a steady solve_sweep call, s/design, and
n_eff_max relative error vs the exact single-core HE11 (air-clad
flagship: inter-core coupling ~1e-9, supermodes degenerate with the
isolated core to well below the solver floor).
"""
import os
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

BINV = int(os.environ.get("TUNE_BINV", "4"))
DEG = int(os.environ.get("TUNE_DEG", "200"))
BP = int(os.environ.get("TUNE_BP", "1"))
B = int(os.environ.get("TUNE_SWEEP", "8"))
MESH = int(os.environ.get("TUNE_MESH", "15000"))
REF = float(os.environ.get("TUNE_REF", "2.2"))
N_MODES = 10


def make_geom(wl):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl)


cfg = SimulationConfig(
    mesh_min_points=MESH, mesh_target_points=MESH,
    mesh=MeshConfig(bucket_rounding=1024),
    solver=SolverConfig(backend="tpu", cheb_degree=DEG, cheb_passes=2,
                        beta_passes=BP, binv_degree=BINV))

geom0 = make_geom(1.55)
grid = MeshGenerator.generate(geom0, REF, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket}",
      flush=True)

wls = np.linspace(1.50, 1.64, B)
geoms = [make_geom(float(w)) for w in wls]

t0 = time.time()
sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
print(f"warmup {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
dt = time.time() - t0
ph = dict(TrueVectorialMaxwellSolver.last_sweep_times)
acc = sum(ph.values())
print(f"steady: {dt/B:.2f} s/design (total {dt:.1f}s, phases {acc:.1f}s, "
      f"untimed {dt-acc:.1f}s)", flush=True)
for k, v in sorted(ph.items(), key=lambda kv: -kv[1]):
    print(f"  {k:12s} {v:7.2f}s  ({v/B:.2f}/design)")

# truth gate: n_eff_max of each design vs exact HE11 at its wavelength
errs = []
for g, ms in zip(geoms, sweep):
    exact = vector_modes(g.wavelength, 1.5, 1.535, 1.0, nu_max=1)
    he11 = max(n for lbl, n in exact)
    errs.append(abs(ms[0]["n_eff"] - he11) / he11)
print(f"binv={BINV} deg={DEG} bp={BP}: rel n_eff err "
      f"max={max(errs):.2e} median={np.median(errs):.2e}", flush=True)
print("modes per design:", [len(m) for m in sweep], flush=True)
