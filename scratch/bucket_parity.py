"""VERDICT r2 #5: bucketed-engine accuracy at production scale.

An off-class-center member (radius ~2%+ away from the bucket's class
center, the worst case the RATIO_BAND=5% binning admits) is solved

  (a) in its bucket: canonical grid built from the CLASS geometry
      (conforming/curved rings at the CLASS radius), member eps cutting
      element interiors, mask-corrected f64 polish;
  (b) on its own conforming mesh (interface rings at the member radius);

both at the production 15k-point band, fast (bp=1) and accuracy (bp=2)
modes, and compared against the exact analytic dispersion (air-clad
flagship: supermodes degenerate with the isolated core to ~1e-9).

Prints the n_eff deltas that docs/PARITY_r3.md records.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.dataset.bucketing import (bucket_key, canonicalize,
                                          class_geometry)
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.analytic import vector_modes
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

import os

MESH = int(os.environ.get("BUCKET_MESH", "15000"))
REF = float(os.environ.get("BUCKET_REF", "2.2"))
# f64-polish member-operator correction: 'deform' (round-5 conforming
# deformation) or 'mask' (round-3 indicator-only)
CORR = os.environ.get("BUCKET_CORR", "deform")
BPS = tuple(int(b) for b in os.environ.get("BUCKET_BP", "1,2").split(","))

# member whose radius sits near a class-band edge (worst case the 5%
# banding admits is +-2.47% off the class center); BUCKET_RFAC scales
# the flagship r_core
RFAC = float(os.environ.get("BUCKET_RFAC", "1.025"))
# class width for the key/class-center (MeshConfig.bucket_ratio_band):
# 0.05 reproduces the r3 measurement; 0.20 is the r5 dataset band
# (worst-case member there is ~+-9.5% off center, RFAC ~1.095)
BAND = float(os.environ.get("BUCKET_BAND", "0.05"))
# BUCKET_OWN=0 skips the own-conforming-mesh solve (the bucket-vs-exact
# column is the gate number; own-mesh is a secondary cross-check that
# costs a fresh compile at an off-band mesh shape)
OWN = os.environ.get("BUCKET_OWN", "1") != "0"
member = MCFGeometry(7, 8.0, 1.5 * RFAC, 1.535, 1.0, wavelength_um=1.55)
key = bucket_key(member, BAND)
cls_geom = class_geometry(key, member, BAND)
print(f"member r/p={member.r_core/8.0:.4f}  class center "
      f"r/p={cls_geom.r_core/8.0:.4f}  "
      f"(member {100*(member.r_core/cls_geom.r_core-1):+.2f}% off center)",
      flush=True)

exact = vector_modes(member.wavelength, member.r_core, 1.535, 1.0, nu_max=1)
he11 = max(n for lbl, n in exact)
print(f"exact isolated-core HE11 n_eff = {he11:.8f}", flush=True)

for bp in BPS:
    cfg = SimulationConfig(
        mesh_min_points=MESH, mesh_target_points=MESH,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                            beta_passes=bp, member_correction=CORR))
    # (a) bucket solve on the CLASS grid
    grid_c = MeshGenerator.generate(cls_geom, REF, cfg)
    dg_c = export_device_grid(grid_c, 1024)
    can, s = canonicalize(member, cls_geom)
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep([can], dg_c, 10, cfg)
    n_bucket = sweep[0][0]["n_eff"]
    t_a = time.time() - t0
    if not OWN:
        print(f"bp={bp}: bucket n_eff={n_bucket:.8f} ({t_a:.0f}s, "
              f"{grid_c.n_points} pts)  bucket-vs-exact "
              f"{abs(n_bucket-he11)/he11:.2e}", flush=True)
        continue
    # (b) own conforming mesh — walk the refinement factor down if the
    # red-refinement granularity overshoots the size band for this
    # radius (REF=2.2 lands 15k for the class geometry but 59k for the
    # band-edge member; a 4x-oversized mesh with an unscaled filter
    # degree is not a valid comparison point)
    grid_m = None
    for ref_m in (REF, 1.8, 1.5, 1.2, 1.0):
        cand = MeshGenerator.generate(member, ref_m, cfg)
        if cand.n_points <= 25000:
            grid_m = cand
            break
    dg_m = export_device_grid(grid_m, 1024)
    t0 = time.time()
    own = TrueVectorialMaxwellSolver.solve_sweep([member], dg_m, 10, cfg)
    n_own = own[0][0]["n_eff"]
    t_b = time.time() - t0
    print(f"bp={bp}: bucket n_eff={n_bucket:.8f} ({t_a:.0f}s, "
          f"{grid_c.n_points} pts)  own-mesh n_eff={n_own:.8f} "
          f"({t_b:.0f}s, {grid_m.n_points} pts)", flush=True)
    print(f"bp={bp}: bucket-vs-own {abs(n_bucket-n_own):.2e}  "
          f"bucket-vs-exact {abs(n_bucket-he11)/he11:.2e}  "
          f"own-vs-exact {abs(n_own-he11)/he11:.2e}", flush=True)
