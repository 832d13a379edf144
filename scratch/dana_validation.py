"""Dana et al. (2024) experimental-validation anchor.

The reference's flagship physics validation is FEM + CMT insertion loss
on the 7-core hexagonal photonic lantern fabricated by direct laser
lithography (Dana et al., Light Sci. Appl. 13:116, 2024):

    FEM + CMT (reference)   IL = 2.383 dB
    3D FDTD                 IL = 0.800 dB
    Experiment (Dana 2024)  IL = 2.670 dB
    (/root/reference/README.md:302-310; BASELINE.md row 3)

This drive reproduces that number through the rebuilt stack: the
flagship 7-core hex device (r = 1.5 um, pitch = 8 um, IP-Dip polymer
n_core = 1.535 at 1550 nm, air cladding — BASELINE config 1, the
device class the reference calibrated its loss constants on:
L_beat = 150 um "calibre Dana 2024", losses.py:262) is solved
vectorially, the sectional loss model gives IL_phys_mux, and the full
3-section taper (15/60/25% split, geometry_unified.py:482-500) is
propagated by CMT over N_SLICES cross-sections for IL_CMT_mux.

Env knobs: DANA_MESH (default 15000), DANA_REF (2.2), DANA_SLICES (9),
DANA_PRESET (balanced — the calibrated 5e-5-gate tier; fast|accuracy),
DANA_BP (override beta_passes), DANA_COUPLING (approximate|rigorous),
DANA_BACKEND (tpu | hybrid — hybrid is the reference-faithful ARPACK
transverse pencil: with the bit-parity loss stack (docs/
LOSS_PARITY_r5.txt) it isolates whether IL differences vs the
reference's 2.383 dB come from the mode solutions or the loss model).

Run on TPU: nohup python -u scratch/dana_validation.py > /tmp/dana.log &
CPU smoke:  DANA_MESH=2000 DANA_REF=1.0 python scratch/dana_validation.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

if os.environ.get("DANA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DANA_PLATFORM"])

from pl_fem_tpu.config import MeshConfig, SimulationConfig, solver_preset
from pl_fem_tpu.dataset.generator import DatasetGenerator

MESH = int(os.environ.get("DANA_MESH", "15000"))
REF = float(os.environ.get("DANA_REF", "2.2"))
SLICES = int(os.environ.get("DANA_SLICES", "9"))
PRESET = os.environ.get("DANA_PRESET", "balanced")
BP = os.environ.get("DANA_BP")  # optional beta_passes override
COUPLING = os.environ.get("DANA_COUPLING", "approximate")
BACKEND = os.environ.get("DANA_BACKEND", "tpu")

IL_REF_FEMCMT = 2.383   # dB, reference FEM+CMT (README.md:306)
IL_REF_EXP = 2.670      # dB, Dana 2024 experiment (README.md:308)

# Dana-class device == BASELINE config 1: n_core = 1.535 at 1550 nm ->
# delta_n_percent = 1.5 over POLYMER_N = 1.53 (the reference's
# main.py:51 constant); taper 0.375 mm (the reference's
# _build_design_params default L = 375 um, losses.py:941-954)
sample = {
    "sample_id": "DANA7HEX",
    "n_cores": 7,
    "core_radius_um": 1.5,
    "pitch_um": 8.0,
    "delta_n_percent": 1.5,
    "wavelength_nm": 1550.0,
    "taper_length_mm": 0.375,
    "taper_profile": "exponential",
}

overrides = {"beta_passes": int(BP)} if BP else {}
scfg = solver_preset(PRESET, backend=BACKEND, cheb_degree=200,
                     cheb_passes=2, **overrides)
cfg = SimulationConfig(
    mesh_min_points=MESH, mesh_target_points=MESH,
    mesh=MeshConfig(refinement=REF, bucket_rounding=1024),
    cmt_coupling=COUPLING, solver=scfg)

gen = DatasetGenerator(config=cfg, use_vectorial=True,
                       n_taper_slices=SLICES)
t0 = time.time()
rec = gen.simulate_sample(sample)
dt = time.time() - t0

print(f"\nsolved in {dt:.0f}s: success={rec.success} "
      f"({rec.n_modes_found} modes, mesh {rec.mesh_points} pts, "
      f"n_eff_max={rec.n_eff_max})")
if rec.error_msg:
    print(f"error: {rec.error_msg}")

rows = [
    ("IL_phys_mux (sectional model)", rec.IL_phys_mux_dB),
    ("IL_CMT_mux (taper propagation)", rec.IL_CMT_mux_dB),
    ("reference FEM+CMT", IL_REF_FEMCMT),
    ("experiment (Dana 2024)", IL_REF_EXP),
]
print("\n| quantity | IL (dB) | delta vs experiment |")
print("|---|---|---|")
for name, v in rows:
    if v is None:
        print(f"| {name} | - | - |")
    else:
        print(f"| {name} | {v:.3f} | {v - IL_REF_EXP:+.3f} |")
print(f"\nMDL_mux={rec.MDL_phys_mux_dB}  PDL_mux={rec.PDL_mux_dB}  "
      f"XT_mux={rec.crosstalk_mux_dB}  adiabatic={rec.adiabatic_score}")

out = {
    "sample": sample,
    "mesh_points": rec.mesh_points,
    "n_modes": rec.n_modes_found,
    "IL_phys_mux_dB": rec.IL_phys_mux_dB,
    "IL_CMT_mux_dB": rec.IL_CMT_mux_dB,
    "IL_ref_fem_cmt_dB": IL_REF_FEMCMT,
    "IL_experiment_dB": IL_REF_EXP,
    "MDL_phys_mux_dB": rec.MDL_phys_mux_dB,
    "PDL_mux_dB": rec.PDL_mux_dB,
    "backend": BACKEND,
    "coupling": COUPLING,
    "n_taper_slices": SLICES,
    "preset": PRESET,
    "beta_passes": scfg.beta_passes,
    "polish_qres_tol": scfg.polish_qres_tol,
    "solver_time_s": round(dt, 1),
}
print("\nJSON: " + json.dumps(out))
