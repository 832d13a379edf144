"""Apply-cost breakdown at SWEEP lanes (L = 3*B*k) on the real mesh.

Times the packed A apply, mass apply, binv, and their gather/accumulate
sub-ops at production size, to target kernel work where the time is.
Usage: python -u scratch/micro_sweep2.py [mesh_min] [B]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

MESH_MIN = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = 22

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.kernels import QFactorSweep
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024))
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in np.linspace(1.50, 1.64, B)]
grid = MeshGenerator.generate(geoms[0], 0.7, cfg)
dg = export_device_grid(grid, 1024)
ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
invs = []
for g in geoms:
    qf, diag = assemble_vector3_qf(ga, eps_arrays(g.eps_params(),
                                                  dtype=jnp.float32))
    invs.append(qf.inv_eps)
qs = QFactorSweep(invJT=qf.invJT, w=qf.w, inv_eps=jnp.stack(invs),
                  gp=ga.grad_phys)
D = dg.n_dofs_padded
E = dg.elem_dofs.shape[0]
L = 3 * B * K
print(f"mesh {grid.n_dofs} dofs D={D} E={E} B={B} L={L}", flush=True)

betas = jnp.asarray([g.k0 * lp01_neff_estimate(
    g.k0, 1.5, g.n_core, g.n_clad) for g in geoms], jnp.float32)
parks = jnp.full((B,), 500.0, jnp.float32)
mask = ga.interior_mask
ds = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
lo = jnp.asarray(kernels.MASS_LO, jnp.float32)
hi = jnp.asarray(kernels.MASS_HI, jnp.float32)

rng = jax.random.PRNGKey(0)
Xf = jax.random.normal(rng, (D, B, 3, K), jnp.float32)
Xl = Xf.reshape(D, L)
Ye = jax.random.normal(rng, (E, 6, L), jnp.float32)


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


applyA = jax.jit(lambda x: kernels._apply_vector3_fused(
    qs, gs, mask, parks, betas, jnp.float32(1.0), x))
applyM = jax.jit(lambda x: kernels._apply_mass_fused(qs, gs, mask, x))
binv4 = jax.jit(lambda x: kernels._apply_binv_fused(
    qs, gs, mask, ds, lo, hi, x, 4))
gat = jax.jit(lambda x: x[gs.elem_dofs].reshape(E, 6, L))
acc = jax.jit(lambda y: kernels._accumulate_fused(y, gs))

tA = bench("A apply (fused)", applyA, Xf)
tM = bench("mass apply", applyM, Xl)
tB = bench("binv deg4 (4x mass + vec)", binv4, Xl)
tG = bench("gather U", gat, Xl)
tC = bench("accumulate", acc, Ye)
step = tA + tB
print(f"step = A + binv = {step:.1f} ms -> deg300 pass = "
      f"{step * 0.3:.1f} s", flush=True)
print(f"einsum+misc share of A: {tA - tG - tC:.2f} ms; "
      f"of mass: {tM - tG - tC:.2f} ms", flush=True)
print("DONE", flush=True)
