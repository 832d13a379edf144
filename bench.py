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

Hang-proofing (round 4, after BENCH_r03 zeroed on a backend-init hang):

- the parent never launches an expensive child until a cheap liveness
  probe (``timeout``-bounded ``jax.devices()`` subprocess) passes; a
  wedged backend costs ~75 s per probe, retried across the budget,
  instead of a whole phase.
- the child prints a PROVISIONAL JSON line immediately after the timed
  fast-mode sweep (``"baseline": "stored"``), then after the live
  ARPACK baseline, then after the balanced-preset sweep (the 5e-5-gate
  tier), then after the accuracy-mode sweep — so a child killed at ANY
  point keeps everything it finished.
- the parent parses ``e.stdout`` of a timed-out child
  (``subprocess.TimeoutExpired`` carries the output read so far) and
  keeps the best-ranked JSON across all phases.
- a SIGTERM/SIGINT from an outer ``timeout`` still prints the best
  JSON seen so far before exiting.
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
# accuracy-mode sweep width: the qres-gated 2e-6 mode measured
# 146.8 s/design warm at B=8 (2026-08-20) — a full-width stage blows
# the driver's 840 s budget and the scored JSON loses the accuracy
# fields entirely. B=2 reuses the filter programs the shrinking
# active set already compiled and fits the budget; per-design cost at
# B=2 is amortization-pessimistic, which is the honest direction.
N_ACC = int(os.environ.get("BENCH_ACC_SWEEP", "2"))
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
# cap on the live ARPACK baseline loop inside the child; past it the
# stored baseline (docs/BASELINE_HOST.json) stands in
BASELINE_CAP_S = float(os.environ.get("BENCH_BASELINE_CAP_S", "240"))
PROBE_T = float(os.environ.get("BENCH_PROBE_T", "75"))

_STORED_BASELINE = Path(__file__).parent / "docs" / "BASELINE_HOST.json"
# written by a child after its production fast-mode sweep completes:
# proof that this VM's persistent XLA cache holds the production
# programs, so the parent can skip the small-mesh insurance phase and
# give the production child enough budget for the accuracy stage
# (warm stage costs measured 2026-08-20: warmup 57 s + sweep 29 s +
# live baseline 80 s + balanced B=2 ~80 s + accuracy B=2 465 s
# ~= 710 s of the 840 s budget; every stage prints provisional JSON)
_WARM_MARKER = (Path(os.path.expanduser("~/.cache/pl_fem_tpu"))
                / "bench_warm.json")


def _cache_is_warm():
    try:
        d = json.loads(_WARM_MARKER.read_text())
        fresh = (time.time() - d["time"]) < 48 * 3600.0
        return fresh and abs(d["mesh_min"] - MESH_MIN) <= 0.2 * MESH_MIN
    except (OSError, KeyError, ValueError):
        return False


def _write_warm_marker():
    try:
        _WARM_MARKER.parent.mkdir(parents=True, exist_ok=True)
        _WARM_MARKER.write_text(json.dumps(
            {"time": time.time(), "mesh_min": MESH_MIN}))
    except OSError:
        pass


def _stored_baseline(mesh_points):
    """Pre-measured ARPACK s/design on this host, if mesh-matched."""
    try:
        d = json.loads(_STORED_BASELINE.read_text())
        if abs(d["mesh_points"] - mesh_points) / mesh_points < 0.15:
            return float(d["per_design_s"])
    except (OSError, KeyError, ValueError, ZeroDivisionError):
        pass
    return None


def child_main():
    """One full bench at the configured mesh.

    Prints a JSON line after EVERY completed stage (fast sweep ->
    live baseline -> accuracy sweep); the parent keeps the last one,
    so a kill at any point preserves all finished stages.
    """
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

    from pl_fem_tpu.config import (MeshConfig, SimulationConfig,
                                   SolverConfig, solver_preset)
    from pl_fem_tpu.models import MCFGeometry
    from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid

    def make_geom(wl_um):
        return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl_um)

    # Fast (dataset) mode: one outer round, one bootstrapped fine
    # pass. Measured n_eff accuracy at the production mesh: ~8e-4
    # relative — the same error class as the ARPACK baseline's
    # transverse pencil on the identical mesh (~+1e-3, which includes a
    # ~6e-4 model error no refinement removes; docs/PARITY_r2.md).
    cfg = SimulationConfig(
        mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                            beta_passes=1))
    # Accuracy mode (beta_passes>=2 + qres-gated outer rounds):
    # measured 2-3e-6 relative n_eff on conforming meshes — the config
    # that satisfies the <5e-5 parity gate (/root/reference/README.md:44).
    cfg_acc = SimulationConfig(
        mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=SolverConfig(backend="tpu", cheb_degree=200, cheb_passes=2,
                            beta_passes=2))
    # Balanced preset: the calibrated 5e-5-gate tier (4.5e-5 vs exact
    # dispersion at this mesh, scratch/balanced_calib.py) — the honest
    # "matched accuracy gate" ratio against the ARPACK baseline.
    cfg_bal = SimulationConfig(
        mesh_min_points=MESH_MIN, mesh_target_points=MESH_MIN,
        mesh=MeshConfig(bucket_rounding=1024),
        solver=solver_preset("balanced", backend="tpu", cheb_degree=200,
                             cheb_passes=2))
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

    result = {
        "metric": "designs_per_hour_7core_hex_10modes",
        "value": round(rate, 2),
        "unit": "designs/hour/chip",
        "vs_baseline": 0.0,
        "mesh_points": grid.n_points,
        "n_dofs": grid.n_dofs,
        "warmup_s": round(warmup_s, 1),
        "per_design_s": round(per_design, 2),
    }
    stored = _stored_baseline(grid.n_points)
    if stored is not None:
        result["vs_baseline"] = round(stored / per_design, 2)
        result["baseline_per_design_s"] = stored
        result["baseline"] = "stored"
    print(json.dumps(result), flush=True)      # provisional #1
    if MESH_MIN >= 10000:
        _write_warm_marker()   # production programs are now cached

    # live baseline: reference algorithm (ARPACK shift-invert) on host
    # CPU, time-capped; the stored number stands in past the cap
    t_base0 = time.time()
    n_done = 0
    for wl in wls[:N_BASELINE]:
        g = make_geom(float(wl))
        TrueVectorialMaxwellSolver(g, config=cfg_base) \
            .solve_vectorial_modes(dg, N_MODES)
        n_done += 1
        if time.time() - t_base0 > BASELINE_CAP_S:
            break
    if n_done:
        base_per_design = (time.time() - t_base0) / n_done
        sys.stderr.write(f"baseline (ARPACK): {base_per_design:.2f} "
                         f"s/design over {n_done}\n")
        result["vs_baseline"] = round(base_per_design / per_design, 2)
        result["baseline_per_design_s"] = round(base_per_design, 2)
        result["baseline"] = "measured"
        print(json.dumps(result), flush=True)  # provisional #2

    # balanced-preset sweep (same bucket + filter programs): throughput
    # AT the reference's <5e-5 n_eff gate at ~4x fast-mode cost
    try:
        geoms_bal = geoms[:max(1, N_ACC)]
        t0 = time.time()
        TrueVectorialMaxwellSolver.solve_sweep(geoms_bal, dg, N_MODES,
                                               cfg_bal)
        bal_per_design = (time.time() - t0) / len(geoms_bal)
        sys.stderr.write(f"balanced sweep: {bal_per_design:.2f} s/design\n")
        result["balanced_per_design_s"] = round(bal_per_design, 2)
        result["balanced_designs_per_hour"] = round(
            3600.0 / bal_per_design, 2)
        if "baseline_per_design_s" in result:
            result["balanced_vs_baseline"] = round(
                result["baseline_per_design_s"] / bal_per_design, 2)
        result["balanced_mode"] = ("preset 'balanced': 4.5e-5 n_eff vs "
                                   "exact (5e-5 gate)")
        print(json.dumps(result), flush=True)  # provisional #3
    except Exception as e:  # noqa: BLE001 — keep the fast-mode result
        sys.stderr.write(f"balanced sweep failed: {e!r}\n")

    # accuracy-mode sweep (same bucket, warm cache): throughput at the
    # qres-gated ~2e-6 plateau
    try:
        geoms_acc = geoms[:max(1, N_ACC)]
        t0 = time.time()
        TrueVectorialMaxwellSolver.solve_sweep(geoms_acc, dg, N_MODES,
                                               cfg_acc)
        acc_per_design = (time.time() - t0) / len(geoms_acc)
        result["accuracy_sweep_width"] = len(geoms_acc)
        sys.stderr.write(f"accuracy sweep: {acc_per_design:.2f} s/design\n")
        result["accuracy_per_design_s"] = round(acc_per_design, 2)
        result["accuracy_designs_per_hour"] = round(3600.0 / acc_per_design,
                                                    2)
        if "baseline_per_design_s" in result:
            result["accuracy_vs_baseline"] = round(
                result["baseline_per_design_s"] / acc_per_design, 2)
        result["accuracy_mode"] = "beta_passes=2 qres-gated (~2e-6 n_eff)"
    except Exception as e:  # noqa: BLE001 — keep the fast-mode result
        sys.stderr.write(f"accuracy sweep failed: {e!r}\n")
    print(json.dumps(result), flush=True)      # final


# ---------------------------------------------------------------------------
# parent: probe -> phases -> best JSON
# ---------------------------------------------------------------------------

def _parse_json_lines(text):
    """Last parseable JSON object line in ``text``, or None."""
    best = None
    for line in (text or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                best = json.loads(line)
            except json.JSONDecodeError:
                continue
    return best


def _rank(res):
    """Order results: production beats fallback, measured-baseline and
    accuracy fields beat provisional, later stages beat earlier."""
    if res is None:
        return (-1,)
    return (0 if res.get("fallback") else 1,
            1 if res.get("baseline") == "measured" else 0,
            1 if "accuracy_per_design_s" in res else 0,
            1 if res.get("value", 0) > 0 else 0)


def _probe_backend(timeout_s=PROBE_T):
    """True iff the jax backend initializes AND computes within bound.

    Runs in a subprocess so a wedged backend init (the r03 failure
    mode: ``jax.devices()`` never returns) costs ``timeout_s``, not a
    whole phase."""
    code = ("import os, jax; "
            "p = os.environ.get('BENCH_PLATFORM'); "
            "p and jax.config.update('jax_platforms', p); "
            "import jax.numpy as jnp; "
            "assert float(jnp.ones((8, 8)).sum()) == 64.0; print('ok')")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
        return proc.returncode == 0 and "ok" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_backend(deadline):
    """Probe until the backend answers or ``deadline`` passes.

    Probe timeouts ESCALATE (75 -> 150 -> 300 s): a healthy chip whose
    cold axon init legitimately takes >75 s must not fail every probe
    forever (the BENCH_r04 zero was eight identical 75 s probes that
    burned the whole budget)."""
    n = 0
    while True:
        t0 = time.time()
        left = deadline - t0
        if left <= 5.0:
            return False
        probe_t = min(PROBE_T * (2 ** min(n, 2)), left)
        if _probe_backend(probe_t):
            if n:
                sys.stderr.write(f"backend live after {n} failed "
                                 "probes\n")
            return True
        n += 1
        sys.stderr.write(f"backend probe {n} failed "
                         f"({time.time() - t0:.0f}s of {probe_t:.0f}s); "
                         "retrying\n")
        if deadline - time.time() > 30.0:
            time.sleep(10.0)


def _run_child(env_extra, timeout_s):
    """Run one child bench; return its best JSON line or None.

    Parses stdout whether the child EXITED or TIMED OUT
    (``TimeoutExpired.stdout`` carries everything read so far), so the
    provisional lines survive a kill at any stage."""
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    env["BENCH_CHILD"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s)
        out, err = proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        sys.stderr.write(f"bench child timed out after {timeout_s:.0f}s\n")
        out = e.stdout or b""
        err = e.stderr or b""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
    sys.stderr.write((err or "")[-2000:] + "\n")
    return _parse_json_lines(out)


def main():
    t_start = time.time()
    deadline = t_start + BUDGET_S - 10.0
    best = {}          # best[0] holds the best JSON dict seen so far
    printed = []

    def emit(result):
        if printed:
            return
        printed.append(True)
        print(json.dumps(result), flush=True)

    def consider(res, fallback=False):
        if res is None:
            return
        if fallback:
            res = dict(res)
            res["fallback"] = True
        if _rank(res) > _rank(best.get(0)):
            best[0] = res
            sys.stderr.write(f"best so far: {res}\n")

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

    # Never start an expensive child against a wedged backend: probe
    # first, retrying across (most of) the budget. Reserve enough tail
    # to still run a production child if the backend comes back late.
    if not _wait_backend(deadline - 240.0):
        # one last probe window against the full deadline
        if not _wait_backend(min(deadline, time.time() + PROBE_T + 5.0)):
            # Last-ditch: with >=180 s of budget left, launch ONE
            # fallback-mesh child anyway. Probes can be wrong (a slow-
            # but-healthy init) and a hung child is already bounded by
            # the remaining budget — there is nothing to lose.
            remaining = deadline - time.time()
            if remaining >= 180.0:
                sys.stderr.write("probes never passed; launching "
                                 f"last-ditch fallback child "
                                 f"({remaining:.0f}s left)\n")
                res = _run_child({"BENCH_MESH_MIN": FB_MESH_MIN,
                                  "BENCH_REF": FB_REFINE,
                                  "BENCH_BASELINE_CAP_S": 60}, remaining)
                consider(res, fallback=True)
            if best:
                emit(best[0])
                return
            emit({"metric": "designs_per_hour_7core_hex_10modes",
                  "value": 0.0, "unit": "designs/hour/chip",
                  "vs_baseline": 0.0,
                  "error": "TPU backend unavailable for the whole "
                           "bench budget (liveness probes never passed)"})
            return

    # Phase A — small-mesh insurance (cheap compiles, ~2 min); skipped
    # when the budget is tight so the production phase keeps >= 420 s,
    # or when a fresh warm-marker proves this VM already compiled the
    # production programs (then Phase A would only squeeze Phase B's
    # accuracy stage out of the budget)
    remaining = deadline - time.time()
    if _cache_is_warm():
        sys.stderr.write("warm marker found: skipping the small-mesh "
                         "insurance phase\n")
    elif remaining > 600.0:
        res = _run_child({"BENCH_MESH_MIN": FB_MESH_MIN,
                          "BENCH_REF": FB_REFINE,
                          "BENCH_BASELINE_CAP_S": 60},
                         min(240.0, remaining - 420.0))
        consider(res, fallback=True)

    # Phase B — production mesh under the remaining budget, with one
    # retry if the first child produced nothing and budget remains
    for attempt in range(2):
        remaining = deadline - time.time()
        if remaining < 150.0:
            break
        if attempt and not _wait_backend(deadline - 120.0):
            break
        res = _run_child({"BENCH_MESH_MIN": MESH_MIN,
                          "BENCH_REF": REFINE}, remaining)
        consider(res)
        if res is not None:
            break

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
