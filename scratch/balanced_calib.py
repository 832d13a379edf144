"""Calibrate the BALANCED solver preset against analytic truth.

VERDICT r4 "missing #4": throughput at the reference's 5e-5 accuracy
gate (/root/reference/README.md:44). Fast mode (~8e-4) fails the gate;
accuracy mode (2e-6) costs ~40x fast per design (docs/STATUS_round5.md).
The gap is unexploited: a qres-gated solve with a LOOSENED tol and a
small round cap should certify 5e-5-grade roots at a small multiple of
fast-mode cost.

This drive solves the flagship air-clad 7-core hex (where the exact
vector dispersion of ops/analytic.py is the truth source — the
supermode cluster is degenerate with the isolated core to ~1e-9,
docs/PARITY_r2.md) at the production mesh band under candidate knob
combos, and prints per-candidate:

    n_eff error vs exact HE11 | wall s/design | rounds taken

Run on TPU:  nohup python -u scratch/balanced_calib.py > /tmp/calib.log &
CPU smoke:   CALIB_MESH=2000 CALIB_REF=1.0 CALIB_B=1 python ...
Env: CALIB_MESH (15000), CALIB_REF (2.2), CALIB_B (2 identical-class
     lanes — amortizes like a real bucket).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

if os.environ.get("CALIB_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["CALIB_PLATFORM"])

from pl_fem_tpu.config import MeshConfig, SimulationConfig, solver_preset
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.analytic import vector_modes
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

MESH = int(os.environ.get("CALIB_MESH", "15000"))
REF = float(os.environ.get("CALIB_REF", "2.2"))
B = int(os.environ.get("CALIB_B", "2"))

geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
exact = vector_modes(geom.wavelength, geom.r_core, 1.535, 1.0, nu_max=1)
he11 = max(n for _, n in exact)
print(f"exact isolated-core HE11 n_eff = {he11:.8f}", flush=True)

# candidates: (label, preset kwargs). fast is the reference point; the
# balanced ladder trades qres tol / round cap; accuracy numbers are in
# docs/STATUS_round5.md (146.8 s/design B=8, 232.7 B=2) and are not
# re-burned here.
CANDS = [
    ("fast",          "fast",     {}),
    ("bal-1.2e-4/r3", "balanced", {}),
    ("bal-6e-5/r4",   "balanced", {"polish_qres_tol": 6e-5,
                                   "qres_max_rounds": 4}),
    ("bal-2.5e-4/r2", "balanced", {"polish_qres_tol": 2.5e-4,
                                   "qres_max_rounds": 2}),
]

rows = []
for label, preset, kw in CANDS:
    scfg = solver_preset(preset, backend="tpu", cheb_degree=200,
                         cheb_passes=2, **kw)
    cfg = SimulationConfig(mesh_min_points=MESH, mesh_target_points=MESH,
                           mesh=MeshConfig(bucket_rounding=1024),
                           solver=scfg)
    grid = MeshGenerator.generate(geom, REF, cfg)
    dg = export_device_grid(grid, 1024)
    # warm call compiles; the steady call is the honest timing
    geos = [geom] * B
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geos, dg, 10, cfg)
    t_warm = time.time() - t0
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geos, dg, 10, cfg)
    t1 = (time.time() - t0) / B
    n_eff = sweep[0][0]["n_eff"]
    err = abs(n_eff - he11) / he11
    times = dict(TrueVectorialMaxwellSolver.last_sweep_times or {})
    rows.append((label, err, t1, t_warm / B, times))
    print(f"{label:>14}: n_eff={n_eff:.8f} err={err:.2e} "
          f"{t1:.1f} s/design (warm-call {t_warm/B:.1f})  "
          f"phases={ {k: round(v,1) for k,v in times.items()} }",
          flush=True)

print("\n| candidate | n_eff err vs exact | s/design | gate(5e-5) |")
print("|---|---|---|---|")
for label, err, t1, _, _ in rows:
    print(f"| {label} | {err:.2e} | {t1:.1f} | "
          f"{'PASS' if err <= 5e-5 else 'fail'} |")
