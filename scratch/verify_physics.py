"""User-style drive: solve -> losses (mux+demux) -> CMT, end to end."""
import cpu_env  # noqa: F401  (forces 8-device CPU mesh)
import numpy as np

from pl_fem_tpu import MCFGeometry, SimulationConfig
from pl_fem_tpu.config import MeshConfig, SolverConfig
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import ScalarHelmholtzSolver, TrueVectorialMaxwellSolver
from pl_fem_tpu.physics import LossCalculator
from pl_fem_tpu.physics.cmt import CoupledModeTheory

geom = MCFGeometry(3, 8.0, 1.4, 1.53, 1.0, wavelength_um=1.55,
                   taper_length_um=375.0)
cfg = SimulationConfig(mesh_min_points=900, mesh_target_points=3000,
                       mesh=MeshConfig(bucket_rounding=256),
                       solver=SolverConfig(cheb_degree=150, cheb_passes=2,
                                           beta_passes=1))
grid = MeshGenerator.generate(geom, 0.4, cfg)
dg = export_device_grid(grid, 256)
print(f"mesh {grid.n_dofs} dofs")

modes = TrueVectorialMaxwellSolver(geom, config=cfg) \
    .solve_vectorial_modes(dg, n_modes_target=6)
print(f"{len(modes)} vectorial modes; n_eff top: "
      f"{[round(m['n_eff'], 5) for m in modes[:6]]}")
print("pols:", [m["polarization"] for m in modes[:6]])

mux = LossCalculator.calculate_physical_losses(modes, geom, "mux", 1550.0)
demux = LossCalculator.calculate_physical_losses(modes, geom, "demux", 1550.0)
print(f"MUX  : IL={mux['IL_dB']:.3f} MDL={mux['MDL_dB']:.3f} "
      f"PDL={mux['PDL_dB']:.3f} XT={mux['crosstalk_dB']:.1f}")
print(f"DEMUX: IL={demux['IL_dB']:.3f} MDL={demux['MDL_dB']:.3f} "
      f"PDL={demux['PDL_dB']:.3f} XT={demux['crosstalk_dB']:.1f}")
assert mux["success"] and demux["success"]
assert demux["PDL_dB"] > mux["PDL_dB"]

# CMT over a synthetic z stack built from the solved modes (field_vector
# alias for CMT = transverse Ex component)
for m in modes:
    m["field_vector"] = m["Ex_dofs"]
z = np.linspace(0.0, 375.0, 25)
modes_list = [modes for _ in z]
cmt = CoupledModeTheory(omega=2 * np.pi * 3e8 / 1.55e-6)
A0 = np.zeros(len(modes), dtype=complex)
A0[0] = 1.0
res = cmt.propagate_cmt(z, modes_list, A0, "mux")
print(f"CMT mux: IL={res['IL_dB']:.4f} dB conservation="
      f"{res['power_conservation']:.6f}")
assert cmt.verify_power_conservation(res)
ad = cmt.estimate_adiabaticity(z, modes_list)
print(f"adiabaticity: violations={ad['n_violations']} "
      f"is_adiabatic={ad['is_adiabatic']}")
print("PHYSICS DRIVE OK")
