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
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Budget-proofing (round-3, after BENCH_r02 timed out in warmup): the
parent process (no jax import) first runs a SMALL-mesh child as cheap
insurance, then a production-mesh child under the remaining budget
(``BENCH_BUDGET_S``, default 840 s). Whichever production result
exists wins; otherwise the small-mesh fallback is printed with
``"fallback": true``. A SIGTERM/SIGINT from an outer ``timeout`` still
prints the best JSON seen so far before exiting.
"""
import json
import os
import signal
import subprocess
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
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "840"))
# insurance phase: a small mesh whose compiles + solves take ~2 min
# (3k pts / ~12k dofs; 6k pts measured too slow to finish in 300 s on
# a cold cache)
FB_MESH_MIN = int(os.environ.get("BENCH_FB_MESH_MIN", "3000"))
FB_REFINE = float(os.environ.get("BENCH_FB_REF", "1.0"))


def child_main():
    """One full bench at the configured mesh; prints one JSON line."""
    import numpy as np

    import jax
    # belt-and-braces: the package __init__ already points the
    # persistent XLA compile cache at ~/.cache/pl_fem_tpu/xla (env
    # PL_FEM_COMPILE_CACHE overrides); do not fight it here — two
    # processes racing different cache dirs was a round-2 bug.
    if os.environ.get("BENCH_PLATFORM"):
        # logic-validation hook (the axon plugin overrides JAX_PLATFORMS
        # env vars; only jax.config.update forces CPU) — the scored
        # bench never sets this
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
    from pl_fem_tpu.models import MCFGeometry
    from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid

    def make_geom(wl_um):
        return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl_um)

    # Fast (dataset) mode: one outer round, one bootstrapped fine
    # pass. Measured n_eff accuracy at the production mesh: ~8e-4
    # relative — the same error class as the ARPACK baseline's
    # transverse pencil on the identical mesh (~+1e-3, which includes a
    # ~6e-4 model error no refinement removes; docs/PARITY_r2.md). The
    # accuracy mode (beta_passes>=2) reaches ~2e-6 at ~2x the cost
    # (per-design round exit, round 3).
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
        "mesh_points": grid.n_points,
        "n_dofs": grid.n_dofs,
        "warmup_s": round(warmup_s, 1),
        "per_design_s": round(per_design, 2),
        "baseline_per_design_s": round(base_per_design, 2),
    }), flush=True)


def _run_child(env_extra, timeout_s, retries=2):
    """Run one child bench; return its parsed JSON line or None.

    A TPU worker crash or a mid-recovery tunnel reports the backend
    UNAVAILABLE and the device comes back in ~60-90 s — retry instead
    of zeroing the round's score on a transient."""
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    env["BENCH_CHILD"] = "1"
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        sys.stderr.write(f"bench child timed out after {timeout_s:.0f}s\n")
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-800:] + "\n")
        return None
    sys.stderr.write(proc.stderr[-2000:] + "\n")
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    transient = ("UNAVAILABLE" in proc.stderr
                 or "Unable to initialize backend" in proc.stderr
                 or "worker process crashed" in proc.stderr)
    remaining = timeout_s - (time.time() - t0) - 95.0
    if transient and retries > 0 and remaining > 120.0:
        sys.stderr.write("backend unavailable; retrying in 90 s "
                         f"({retries} left, {remaining:.0f}s budget)\n")
        time.sleep(90.0)
        return _run_child(env_extra, remaining, retries - 1)
    return None


def main():
    t_start = time.time()
    best = {}          # best[0] holds the best JSON dict seen so far
    printed = []

    def emit(result):
        if printed:
            return
        printed.append(True)
        print(json.dumps(result), flush=True)

    def on_signal(signum, frame):
        # an outer `timeout` sent TERM/INT: print what we have so the
        # driver's parse finds a JSON line even on rc=124
        if best:
            emit(best[0])
        else:
            emit({"metric": "designs_per_hour_7core_hex_10modes",
                  "value": 0.0, "unit": "designs/hour/chip",
                  "vs_baseline": 0.0, "error": f"signal {signum} before "
                  "any phase completed"})
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    # Phase A — small-mesh insurance (cheap compiles, ~2 min)
    fb_timeout = min(300.0, 0.45 * BUDGET_S)
    res = _run_child({"BENCH_MESH_MIN": FB_MESH_MIN,
                      "BENCH_REF": FB_REFINE}, fb_timeout)
    if res is not None:
        res_fb = dict(res)
        res_fb["fallback"] = True
        best[0] = res_fb
        sys.stderr.write(f"fallback result ready: {res_fb}\n")

    # Phase B — production mesh under the remaining budget
    remaining = BUDGET_S - (time.time() - t_start) - 10.0
    if remaining >= 180.0:
        res = _run_child({"BENCH_MESH_MIN": MESH_MIN,
                          "BENCH_REF": REFINE}, remaining)
        if res is not None:
            best[0] = res
    else:
        sys.stderr.write(f"skipping production phase: only "
                         f"{remaining:.0f}s left of BENCH_BUDGET_S="
                         f"{BUDGET_S:.0f}\n")

    if best:
        emit(best[0])
    else:
        emit({"metric": "designs_per_hour_7core_hex_10modes",
              "value": 0.0, "unit": "designs/hour/chip",
              "vs_baseline": 0.0, "error": "all bench phases failed"})


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        child_main()
    else:
        main()
