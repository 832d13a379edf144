"""Split qf pass cost: filter steps vs RR (QR etc.)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

cfg = SimulationConfig(mesh_min_points=2500, mesh_target_points=10000,
                       mesh=MeshConfig(bucket_rounding=1024))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 0.7, cfg)
dg = export_device_grid(grid, 1024)
ga = grid_to_device(dg, dtype=jnp.float32)
ea = eps_arrays(geom.eps_params(), dtype=jnp.float32)
qf, diag = assemble_vector3_qf(ga, ea)
gs = gather_scatter(ga)
k0 = float(geom.k0)
beta0 = k0 * lp01_neff_estimate(k0, 1.5, geom.n_core, geom.n_clad)
cut = jnp.float32(min(beta0**2, 1.35 * k0**2))
park = jnp.float32(10.0 * float(cut))
bound = jnp.float32(18000.0)
ds = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
lo = jnp.asarray(kernels.MASS_LO, jnp.float32)
hi = jnp.asarray(kernels.MASS_HI, jnp.float32)
Dp = dg.n_dofs_padded
print(f"dofs={dg.n_dofs}", flush=True)

for k in (22, 64):
    X = jax.random.normal(jax.random.PRNGKey(1), (3 * Dp, k),
                          dtype=jnp.float32)
    for deg in (2, 100, 300):
        th, Xo, res = kernels.cheb_rr_pass_qf(
            qf, gs, ga.interior_mask, ds, lo, hi, park,
            jnp.float32(beta0), jnp.float32(1.0), X, cut, bound,
            degree=deg, binv_degree=4)
        jax.block_until_ready(Xo)
        t0 = time.time()
        for _ in range(3):
            th, Xo, res = kernels.cheb_rr_pass_qf(
                qf, gs, ga.interior_mask, ds, lo, hi, park,
                jnp.float32(beta0), jnp.float32(1.0), X, cut, bound,
                degree=deg, binv_degree=4)
            jax.block_until_ready(Xo)
        dt = (time.time() - t0) / 3
        print(f"k={k} deg={deg}: {dt*1000:.0f} ms/pass", flush=True)

# raw apply timings
X = jax.random.normal(jax.random.PRNGKey(1), (3 * Dp, 22), jnp.float32)
applyA = jax.jit(lambda x: kernels._apply_vector3_qf(
    qf, gs, ga.interior_mask, park, jnp.float32(beta0), jnp.float32(1.0), x))
applyB = jax.jit(lambda x: kernels._apply_mass_qf(
    qf, gs, ga.interior_mask, x, 3))
for name, f in (("A_qf", applyA), ("B_qf", applyB)):
    y = f(X); jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(20):
        y = f(y / jnp.linalg.norm(y))
    jax.block_until_ready(y)
    print(f"{name}: {(time.time()-t0)/20*1000:.2f} ms/apply", flush=True)
