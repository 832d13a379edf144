"""Split filter-phase cost: chunk recurrence vs RR tail at production
sweep shapes, binv 4 vs 0. Also times a CholeskyQR2 replacement for the
vmapped Householder QR."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.kernels import QFactorSweep
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

B, k, DEG = 8, 22, 200
cfg = SimulationConfig(mesh_min_points=15000, mesh_target_points=15000,
                       mesh=MeshConfig(bucket_rounding=1024))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 2.2, cfg)
dg = export_device_grid(grid, 1024)
ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs", flush=True)

wls = np.linspace(1.50, 1.64, B)
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in wls]
invs = []
for g in geoms:
    qf_g, diag = assemble_vector3_qf(ga, eps_arrays(g.eps_params(),
                                                    dtype=jnp.float32))
    invs.append(qf_g.inv_eps)
qs = QFactorSweep(invJT=qf_g.invJT, w=qf_g.w, inv_eps=jnp.stack(invs),
                  gp=ga.grad_phys)

k0s = np.array([g.k0 for g in geoms])
betas = np.array([g.k0 * lp01_neff_estimate(g.k0, 1.5, g.n_core, g.n_clad)
                  for g in geoms])
cuts = betas**2
parks = 10.0 * cuts
bounds = 80.0 * cuts     # rough; only timing matters here
Dp = dg.n_dofs_padded
D = Dp
dinv_sqrt = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
lo = jnp.asarray(kernels.MASS_LO, jnp.float32)
hi = jnp.asarray(kernels.MASS_HI, jnp.float32)
X = jax.random.normal(jax.random.PRNGKey(0), (3 * Dp, B, k), jnp.float32)
T0 = kernels._fused_from_stacked(X)

jb = lambda x: jax.block_until_ready(x)  # noqa: E731

for binv in (4, 0):
    chunk_fn = kernels.cheb_sweep_chunk
    args = (qs, gs, ga.interior_mask, dinv_sqrt, lo, hi,
            jnp.asarray(parks, jnp.float32), jnp.asarray(betas, jnp.float32),
            jnp.float32(1.0), T0, T0, jnp.asarray(cuts, jnp.float32),
            jnp.asarray(bounds, jnp.float32))
    # warmup
    out = chunk_fn(*args, np.int32(40), np.bool_(True), binv_degree=binv)
    jb(out)
    t0 = time.perf_counter()
    out = chunk_fn(*args, np.int32(40), np.bool_(False), binv_degree=binv)
    jb(out)
    dt = time.perf_counter() - t0
    print(f"binv={binv}: chunk 40 steps {dt:.2f}s -> {dt/40*1e3:.1f} "
          f"ms/step -> deg {DEG} = {dt/40*DEG:.1f}s", flush=True)

rr_args = (qs, gs, ga.interior_mask, jnp.asarray(parks, jnp.float32),
           jnp.asarray(betas, jnp.float32), jnp.float32(1.0), T0)
out = kernels.cheb_sweep_rr(*rr_args)
jb(out)
t0 = time.perf_counter()
out = kernels.cheb_sweep_rr(*rr_args)
jb(out)
print(f"RR tail: {time.perf_counter()-t0:.2f}s", flush=True)

# transfer cost of Xr
t0 = time.perf_counter()
_ = np.asarray(out[1])
print(f"Xr transfer: {time.perf_counter()-t0:.2f}s", flush=True)


# -- CholeskyQR2 probe ---------------------------------------------------
@jax.jit
def cholqr2(Xf):
    D3, Bb, kk = Xf.shape
    hp = jax.lax.Precision.HIGHEST

    def one(Xb):
        def cqr(Y):
            G = jnp.matmul(Y.T, Y, precision=hp)
            G = G + (1e-7 * jnp.trace(G) / kk) * jnp.eye(kk, G.dtype)
            L = jnp.linalg.cholesky(G)
            return jax.scipy.linalg.solve_triangular(
                L, Y.T, lower=True).T
        return cqr(cqr(Xb))
    return jax.vmap(one, in_axes=1, out_axes=1)(Xf)


Xs = kernels._stacked_from_fused(T0)
q = cholqr2(Xs)
jb(q)
t0 = time.perf_counter()
q = cholqr2(Xs)
jb(q)
print(f"CholeskyQR2 (3D,B,k): {time.perf_counter()-t0:.2f}s", flush=True)

qq = jax.jit(jax.vmap(lambda x: jnp.linalg.qr(x)[0], in_axes=1,
                      out_axes=1))
o = qq(Xs)
jb(o)
t0 = time.perf_counter()
o = qq(Xs)
jb(o)
print(f"Householder QR vmapped: {time.perf_counter()-t0:.2f}s", flush=True)
