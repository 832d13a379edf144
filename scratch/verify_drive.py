"""User-style drive: the reference quickstart on pl_fem_tpu (verification)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
print("devices:", jax.devices())
jax.config.update("jax_enable_x64", True)

import pl_fem_tpu
from pl_fem_tpu import MCFGeometry, SimulationConfig
from pl_fem_tpu.config import SolverConfig, MeshConfig
from pl_fem_tpu.solvers import ScalarHelmholtzSolver, TrueVectorialMaxwellSolver

print("pl_fem_tpu", pl_fem_tpu.__version__)

# BASELINE config 1: 7-core hex, r=1.5um, pitch=8um, n_core=1.535, 1550nm
geom = MCFGeometry(n_cores=7, pitch_um=8.0, core_radius_um=1.5,
                   n_core=1.535, n_clad=1.0, wavelength_um=1.55)
ok, msg = geom.validate()
print(geom, "| validate:", ok, msg)

cfg = SimulationConfig(mesh_min_points=4000, mesh_target_points=9000,
                       mesh=MeshConfig(bucket_rounding=1024),
                       solver=SolverConfig(backend="tpu", cheb_degree=300,
                                           cheb_passes=2, beta_passes=2))
t0 = time.time()
solver = TrueVectorialMaxwellSolver(geom, config=cfg)
modes = solver.solve_vectorial_modes(n_modes_target=10)
dt = time.time() - t0
print(f"\n{len(modes)} vectorial modes in {dt:.1f}s:")
print(f"{'#':>3} {'n_eff':>10} {'pol':>8} {'conf':>6} {'PDL_dB':>7} {'div':>8}")
for i, m in enumerate(modes[:14]):
    print(f"{i:>3} {m['n_eff']:>10.6f} {m['polarization']:>8} "
          f"{m['confinement']:>6.3f} {m['PDL_dB']:>7.2f} {m['div_ratio']:>8.1e}")

n_hybrid = sum(1 for m in modes if m["polarization"] != "scalar")
print("hybrid/vector-labeled fraction:", n_hybrid / max(len(modes), 1))

# scalar solve on the same geometry for cross-check
t0 = time.time()
smodes = ScalarHelmholtzSolver(geom, cfg).solve(n_modes_target=10)
print(f"\nscalar: {len(smodes)} modes in {time.time()-t0:.1f}s; "
      f"top n_eff={smodes[0]['n_eff']:.6f} vs vector {modes[0]['n_eff']:.6f}")

# probes
print("\n--- probes ---")
try:
    bad = MCFGeometry(7, 2.0, 1.5, 1.535, 1.0)  # pitch < 2r: overlapping
    print("overlap validate:", bad.validate())
except Exception as e:
    print("overlap constructor raised:", type(e).__name__, e)

try:
    MCFGeometry(7, 8.0, 1.5, 1.0000001, 1.0)
    print("tiny delta_n: constructor accepted (unexpected)")
except ValueError as e:
    print("tiny delta_n raises ValueError:", e)

cfg_bad = SimulationConfig(solver=SolverConfig(backend="banana"))
try:
    ScalarHelmholtzSolver(geom, cfg_bad).solve(n_modes_target=4)
    print("unknown backend: silently ran (check which path!)")
except Exception as e:
    print("unknown backend raised:", type(e).__name__, e)
