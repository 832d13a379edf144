"""End-to-end parity: TPU backend vs ARPACK hybrid on the same 7-core mesh."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
cfg_t = SimulationConfig(mesh_min_points=2500, mesh_target_points=10000,
                         mesh=MeshConfig(bucket_rounding=1024),
                         solver=SolverConfig(backend="tpu", cheb_degree=300,
                                             cheb_passes=2, beta_passes=1))
cfg_h = SimulationConfig(mesh_min_points=2500, mesh_target_points=10000,
                         mesh=MeshConfig(bucket_rounding=1024),
                         solver=SolverConfig(backend="hybrid"))
grid = MeshGenerator.generate(geom, 0.7, cfg_t)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_dofs} dofs", flush=True)

t0 = time.time()
mt = TrueVectorialMaxwellSolver(geom, config=cfg_t) \
    .solve_vectorial_modes(dg, 10)
print(f"tpu: {len(mt)} modes in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
mh = TrueVectorialMaxwellSolver(geom, config=cfg_h) \
    .solve_vectorial_modes(dg, 10)
print(f"hybrid/ARPACK: {len(mh)} modes in {time.time()-t0:.1f}s", flush=True)

net = np.array([m["n_eff"] for m in mt])
neh = np.array([m["n_eff"] for m in mh])
nb = min(len(net), len(neh), 14)
print("idx   tpu         arpack      |diff|")
for i in range(nb):
    print(f"{i:3d} {net[i]:.8f} {neh[i]:.8f} {abs(net[i]-neh[i]):.2e}")
print("max |diff| over first %d: %.2e" % (nb, np.abs(net[:nb]-neh[:nb]).max()))
