"""Time the packed sweep pass and host family build."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops import kernels, host_assembly as ha
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

cfg = SimulationConfig(mesh_min_points=2500, mesh_target_points=10000,
                       mesh=MeshConfig(bucket_rounding=1024))
wls = np.linspace(1.50, 1.64, 8)
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in wls]
grid = MeshGenerator.generate(geoms[0], 0.7, cfg)
dg = export_device_grid(grid, 1024)
ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
invs = []
for g in geoms:
    qf_g, diag = assemble_vector3_qf(ga, eps_arrays(g.eps_params(),
                                                    dtype=jnp.float32))
    invs.append(qf_g.inv_eps)
qs = kernels.QFactorSweep(invJT=qf_g.invJT, w=qf_g.w,
                          inv_eps=jnp.stack(invs), gp=ga.grad_phys)
betas = np.array([g.k0 * lp01_neff_estimate(g.k0, 1.5, g.n_core, g.n_clad)
                  for g in geoms], dtype=np.float32)
cuts = np.array([min(b**2, 1.35 * g.k0**2)
                 for b, g in zip(betas, geoms)], dtype=np.float32)
parks = (10 * cuts).astype(np.float32)
bounds = np.full(8, 20000.0, dtype=np.float32)
ds = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
lo = jnp.asarray(kernels.MASS_LO, jnp.float32)
hi = jnp.asarray(kernels.MASS_HI, jnp.float32)
Dp = dg.n_dofs_padded
X = jax.random.normal(jax.random.PRNGKey(1), (3 * Dp, 8, 22), jnp.float32)
print(f"dofs={dg.n_dofs}", flush=True)

for deg in (2, 300):
    th, Xo, res = kernels.cheb_rr_pass_sweep(
        qs, gs, ga.interior_mask, ds, lo, hi, jnp.asarray(parks),
        jnp.asarray(betas), jnp.float32(1.0), X, jnp.asarray(cuts),
        jnp.asarray(bounds), degree=deg, binv_degree=4)
    jax.block_until_ready(Xo)
    t0 = time.time()
    for _ in range(3):
        th, Xo, res = kernels.cheb_rr_pass_sweep(
            qs, gs, ga.interior_mask, ds, lo, hi, jnp.asarray(parks),
            jnp.asarray(betas), jnp.float32(1.0), X, jnp.asarray(cuts),
            jnp.asarray(bounds), degree=deg, binv_degree=4)
        jax.block_until_ready(Xo)
    print(f"B=8 deg={deg}: {(time.time()-t0)/3*1000:.0f} ms/pass", flush=True)

# convergence trace
Xc = X
hist = []
t0 = time.time()
for ip in range(8):
    th, Xc, res = kernels.cheb_rr_pass_sweep(
        qs, gs, ga.interior_mask, ds, lo, hi, jnp.asarray(parks),
        jnp.asarray(betas), jnp.float32(1.0), Xc, jnp.asarray(cuts),
        jnp.asarray(bounds), degree=300, binv_degree=4)
    jax.block_until_ready(Xc)
    rs = np.asarray(res); tha = np.asarray(th)
    w = tha < cuts[:, None]
    hist.append(rs[w].max())
print("conv:", " ".join(f"{h:.0e}" for h in hist),
      f"({time.time()-t0:.1f}s total)", flush=True)

t0 = time.time()
fam = ha.build_host_vector3_family(dg, geoms[0].eps_params(), 1.0)
print(f"family build: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
hv = fam.instantiate(geoms[0].n_core**2, 1.0)
print(f"instantiate: {(time.time()-t0)*1000:.0f} ms", flush=True)
