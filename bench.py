#!/usr/bin/env python
"""Benchmark: designs/hour on the flagship 7-core vectorial solve.

Runs BASELINE config 1 (7-core hexagonal_1plus6_7, r=1.5 um, pitch=8 um,
n_core=1.535, 1550 nm band, n_modes=10) as a multi-wavelength sweep —
the realistic dataset workload where designs share a mesh bucket — and
reports throughput as designs/hour/chip.

``vs_baseline`` compares against the reference algorithm measured on
THIS host's CPU: the hybrid backend is numerically the reference's
ARPACK shift-invert pipeline (solver_fem.py:196-197) run on the same
assembled system (the reference itself is not runnable here — its scipy
/skfem stack is absent — so its own algorithm serves as the baseline).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

N_SWEEP = int(os.environ.get("BENCH_SWEEP", "8"))
N_BASELINE = int(os.environ.get("BENCH_BASELINE", "2"))
# production mesh scale: the reference's 15-20k-point meshing band
# (/root/reference/mesh.py:246-248). BENCH_REF=2.2 builds the point
# cloud directly at that density (~15k pts / ~60k P2 DOFs) instead of
# overshooting through x4 red refinement; the ARPACK baseline is timed
# on the SAME mesh so the ratio is size-matched.
MESH_MIN = int(os.environ.get("BENCH_MESH_MIN", "15000"))
REFINE = float(os.environ.get("BENCH_REF", "2.2"))
N_MODES = 10


def main():
    import numpy as np

    import jax
    # persistent compile cache: repeat driver runs skip the large
    # one-time XLA compile of the packed sweep kernels
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(__file__).parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
    from pl_fem_tpu.models import MCFGeometry
    from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid

    def make_geom(wl_um):
        return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl_um)

    # Fast (dataset) mode: one outer round, one bootstrapped fine
    # pass. Measured n_eff accuracy at this mesh: ~8e-4 relative —
    # the same error class as the ARPACK baseline's transverse pencil
    # on the identical mesh (~+1e-3, which includes a ~6e-4 model
    # error no refinement removes; docs/PARITY_r2.md). The accuracy
    # mode (beta_passes>=2) reaches ~2e-6 at several times the cost.
    cfg = SimulationConfig(
        mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                            beta_passes=1))
    cfg_base = SimulationConfig(
        mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="hybrid"))

    from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

    geom0 = make_geom(1.55)
    grid = MeshGenerator.generate(geom0, REFINE, cfg)
    dg = export_device_grid(grid, 1024)
    sys.stderr.write(f"bench mesh: {grid.n_points} pts {grid.n_dofs} dofs "
                     f"bucket={dg.bucket}\n")

    # S/C/L/U band sweep wavelengths (BASELINE config 2 style)
    wls = np.linspace(1.50, 1.64, N_SWEEP)
    geoms = [make_geom(float(wl)) for wl in wls]

    # warmup: compile the packed sweep kernels for this bucket
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    warmup_s = time.time() - t0
    sys.stderr.write(f"warmup (compile) {warmup_s:.1f}s, "
                     f"modes per design: {[len(m) for m in sweep]}, "
                     f"n_eff_max={sweep[0][0]['n_eff']:.6f}\n")

    # timed: full end-to-end packed sweep (device filter + host polish)
    t0 = time.time()
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, N_MODES, cfg)
    dt = time.time() - t0
    per_design = dt / N_SWEEP
    rate = 3600.0 / per_design
    sys.stderr.write(f"tpu sweep: {per_design:.2f} s/design -> "
                     f"{rate:.1f} designs/hour "
                     f"(modes per design: {[len(m) for m in sweep]})\n")

    # baseline: reference algorithm (ARPACK shift-invert) on host CPU
    t0 = time.time()
    for wl in wls[:N_BASELINE]:
        g = make_geom(float(wl))
        TrueVectorialMaxwellSolver(g, config=cfg_base) \
            .solve_vectorial_modes(dg, N_MODES)
    base_per_design = (time.time() - t0) / N_BASELINE
    base_rate = 3600.0 / base_per_design
    sys.stderr.write(f"baseline (ARPACK): {base_per_design:.2f} s/design "
                     f"-> {base_rate:.1f} designs/hour\n")

    print(json.dumps({
        "metric": "designs_per_hour_7core_hex_10modes",
        "value": round(rate, 2),
        "unit": "designs/hour/chip",
        "vs_baseline": round(rate / base_rate, 2),
    }))


if __name__ == "__main__":
    main()
