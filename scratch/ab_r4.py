"""Round-4 TPU A/B: apply_layout x accumulate as SolverConfig statics.

Times a steady production-mesh solve_sweep (B=8, 15k pts, fast mode)
for each combo; prints one line per combo. Run on TPU:
    nohup python -u scratch/ab_r4.py > /tmp/ab_r4.log 2>&1 &
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

B = 8
combos = [("packed", "gather"), ("flat", "gather"),
          ("packed", "blk"), ("flat", "blk")]
if len(sys.argv) > 1:
    combos = [tuple(c.split(":")) for c in sys.argv[1:]]

geom0 = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
wls = np.linspace(1.50, 1.64, B)
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in wls]

ref_neff = None
for lay, acc in combos:
    cfg = SimulationConfig(
        mesh_min_points=15000, mesh_target_points=15000,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                            beta_passes=1, apply_layout=lay,
                            accumulate=acc))
    grid = MeshGenerator.generate(geom0, 2.2, cfg)
    dg = export_device_grid(grid, 1024)
    t0 = time.time()
    out = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
    warm = time.time() - t0
    t0 = time.time()
    out = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 10, cfg)
    dt = time.time() - t0
    ph = dict(TrueVectorialMaxwellSolver.last_sweep_times)
    neff = max((m["n_eff"] for m in out[0]), default=float("nan"))
    if ref_neff is None:
        ref_neff = neff
    print(f"AB layout={lay} acc={acc}: steady {dt:.2f}s/call "
          f"({dt/B:.2f} s/design) warm {warm:.1f}s "
          f"neff {neff:.8f} dneff {abs(neff-ref_neff):.2e} "
          f"phases {{{', '.join(f'{k}:{v:.1f}' for k, v in ph.items())}}}",
          flush=True)
print("AB DONE", flush=True)
