"""Microbenchmark the sweep-apply building blocks at bench size.

Times each primitive (gather, accumulate, mass apply, A apply, full
Chebyshev step) in isolation on the device, each wrapped in a jitted
20-iteration fori_loop to amortize dispatch.

Usage: nohup python -u scratch/micro_r2.py > /tmp/micro_r2.log 2>&1 &
Env: MICRO_MESH_MIN (default 8000).
"""
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

MESH_MIN = int(os.environ.get("MICRO_MESH_MIN", "8000"))
B, K = 8, 22
ITERS = 20

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops import kernels as kn
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid

cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 0.7, cfg)
dg = export_device_grid(grid, 1024)
E, D = dg.elem_dofs.shape[0], dg.n_dofs_padded
print(f"mesh: {grid.n_dofs} dofs bucket={dg.bucket} E={E} D={D}",
      flush=True)

ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
qf, diag = assemble_vector3_qf(ga, eps_arrays(geom.eps_params(),
                                              dtype=jnp.float32))
qs = kn.QFactorSweep(invJT=qf.invJT, w=qf.w,
                     inv_eps=jnp.stack([qf.inv_eps] * B),
                     gp=ga.grad_phys)
mask = ga.interior_mask
dinv = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
L = 3 * B * K
key = jax.random.PRNGKey(0)
Xl = jax.random.normal(key, (D, L), dtype=jnp.float32)
Xf4 = Xl.reshape(D, 3, B, K)
Ye = jax.random.normal(key, (E, 6, L), dtype=jnp.float32)
betas = jnp.full((B,), 5.9, jnp.float32)
parks = jnp.full((B,), 400.0, jnp.float32)
lo = jnp.asarray(kn.MASS_LO, jnp.float32)
hi = jnp.asarray(kn.MASS_HI, jnp.float32)


def bench(name, fn, *args, nbytes=0):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    gbps = nbytes / dt / 1e9 if nbytes else 0.0
    print(f"{name:36s} {dt * 1e3:8.2f} ms/iter"
          + (f"  ({gbps:6.1f} GB/s)" if nbytes else ""), flush=True)
    return out


def loop(body):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, v: body(v) / (1.0 + 1e-12 * i), x)
    return run


# 1. row gather alone: U = X[elem_dofs], reduce back to (D, L) shape
def g_only(x):
    U = x[gs.elem_dofs]
    return x + 1e-20 * U.sum(axis=1)[:E // (E // 1), :0].sum() \
        if False else x * 0.999999 + 1e-30 * jnp.zeros_like(x)


@jax.jit
def gather_loop(x):
    def body(i, v):
        U = v[gs.elem_dofs]                 # (E, 6, L)
        s = U.sum(axis=(0, 1))              # force materialization
        return v * 0.999999 + 1e-30 * s[None, :]
    return jax.lax.fori_loop(0, ITERS, body, x)


# 2. accumulate alone
@jax.jit
def accum_loop(y):
    def body(i, v):
        out = kn._accumulate_fused(v.reshape(E, 6, L), gs)   # (D, L)
        return v * 0.999999 + 1e-30 * out.sum(axis=0)[None, None, :]
    return jax.lax.fori_loop(0, ITERS, body, y)


# 3. mass apply
@jax.jit
def mass_loop(x):
    def body(i, v):
        return kn._apply_mass_fused(qs, gs, mask, v) * 0.17
    return jax.lax.fori_loop(0, ITERS, body, x)


# 4. A apply
@jax.jit
def a_loop(x):
    def body(i, v):
        return kn._apply_vector3_fused(qs, gs, mask, parks, betas,
                                       jnp.float32(1.0), v) * 1e-3
    return jax.lax.fori_loop(0, ITERS, body, x)


# 5. binv (4 mass applies + overhead)
@jax.jit
def binv_loop(x):
    def body(i, v):
        return kn._apply_binv_fused(qs, gs, mask, dinv, lo, hi, v, 4) * 0.2
    return jax.lax.fori_loop(0, ITERS, body, x)


gb_g = ITERS * (E * 6 * L * 4) / 1e9  # gathered bytes per loop
print(f"gathered volume per U: {E * 6 * L * 4 / 1e6:.0f} MB", flush=True)
bench("gather (E,6,L)", gather_loop, Xl, nbytes=ITERS * E * 6 * L * 4)
bench("accumulate_fused", accum_loop, Ye,
      nbytes=ITERS * (gs.idx_v.size + gs.idx_e.size) * L * 4)
bench("mass apply", mass_loop, Xl)
bench("A apply", a_loop, Xf4)
bench("binv deg 4", binv_loop, Xl)

# full chebyshev step cost reference: measured pass(deg 300)/300
print("DONE", flush=True)
