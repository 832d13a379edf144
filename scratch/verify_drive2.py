"""Instrumented TPU drive: per-stage timings on the 7-core flagship."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
print("devices:", jax.devices(), flush=True)
jax.config.update("jax_enable_x64", True)

from pl_fem_tpu import MCFGeometry, SimulationConfig
from pl_fem_tpu.config import SolverConfig, MeshConfig
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops.assembly import grid_to_device, eps_at_quadrature, vector3_primitives, combine_vector3
from pl_fem_tpu.ops.operators import stack_blocks, block_diagonal
import jax.numpy as jnp
import numpy as np

T0 = time.time()
def t(tag):
    print(f"[{time.time()-T0:7.1f}s] {tag}", flush=True)

geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
cfg = SimulationConfig(mesh_min_points=2000, mesh_target_points=6000,
                       mesh=MeshConfig(bucket_rounding=1024))
grid = MeshGenerator.generate(geom, 0.6, cfg)
dg = export_device_grid(grid, 1024)
t(f"mesh {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket}")

ga = grid_to_device(dg, dtype=jnp.float64)
jax.block_until_ready(ga.qp_xy); t("grid_to_device")
eps_re, _ = eps_at_quadrature(ga, geom.eps_params())
jax.block_until_ready(eps_re); t("eps_at_quadrature")
prim = vector3_primitives(ga, eps_re)
jax.block_until_ready(prim["i_gxgx"]); t("vector3_primitives")

k0 = geom.k0
beta0 = k0 * lp01_neff_estimate(k0, 1.5, geom.n_core, geom.n_clad)
Ab = combine_vector3(prim, beta0, 1.0)
big64 = stack_blocks(Ab, 3)
jax.block_until_ready(big64); t("combine+stack")

Mb = prim["u_nn"]
Dp = dg.n_dofs_padded
mask = ga.interior_mask
diag_M = block_diagonal(Mb.astype(jnp.float32), ga.elem_dofs, Dp)
diag_M = jnp.where(mask > 0, diag_M, 1.0)
jax.block_until_ready(diag_M); t("diag")

key = jax.random.PRNGKey(0)
lo, hi = kernels.mass_interval(Mb, ga.elem_dofs, mask, diag_M, key, C=3)
jax.block_until_ready(hi); t(f"mass_interval lo={float(lo):.3f} hi={float(hi):.3f}")

ds = (1.0/jnp.sqrt(jnp.maximum(diag_M,1e-30))).astype(jnp.float32)
cut = min(beta0**2/1.0, 1.35*k0**2)
park = 10.0*cut
bound = kernels.pencil_bound(big64, Mb, ga.elem_dofs, mask, ds, lo, hi,
                             jnp.float32(park), key, C=3)
jax.block_until_ready(bound); t(f"pencil_bound={float(bound):.1f} cut={cut:.1f}")

k = 22
X = jax.random.normal(key, (3*Dp, k), dtype=jnp.float64)
for ip in range(3):
    theta, X, res = kernels.cheb_rr_pass(
        big64, Mb, ga.elem_dofs, mask, ds, lo, hi, jnp.float32(park),
        X, jnp.float64(cut), bound.astype(jnp.float64), C=3, degree=300)
    jax.block_until_ready(X)
    th = np.asarray(theta); rs = np.asarray(res)
    w = th < cut
    t(f"pass {ip}: wanted={w.sum()} maxres={rs[w].max() if w.any() else -1:.2e}")
t("done")
