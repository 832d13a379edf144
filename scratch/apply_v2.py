"""A/B the fused A-apply against a lane-utilization-fixed variant.

Hypothesis (micro_r2.log): the q-loop's (E, B, 3, k=22) shapes tile at
~6% utilization (minor dim 22/128 lanes, second-minor 3/8 sublanes),
which is why the A apply costs 40-55 ms when its gather (2.5 ms) and
accumulate (10.5 ms) don't. v2 computes the same algebra on
component-split FLAT (E, B*k) arrays (one transpose after the gather,
one before the accumulate) so the lane dim is B*k = 176.

Usage: python -u scratch/apply_v2.py [mesh_min] [B] [iters]
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
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
K = 22

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.kernels import QFactorSweep, _N_REF, _accumulate_fused
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
alpha = jnp.float32(1.0)
mask = ga.interior_mask

rng = jax.random.PRNGKey(0)
Xf = jax.random.normal(rng, (D, B, 3, K), jnp.float32)


def apply_v2(qs, gs, mask, parks, betas, alpha, Xf):
    """Component-split flat-lane A(beta) apply; same math as
    kernels._apply_vector3_fused."""
    D, B, C, k = Xf.shape
    L = B * C * k
    BK = B * k
    m = mask[:, None].astype(Xf.dtype)
    Xl = Xf.reshape(D, L)
    Xm = Xl * m
    U = Xm[gs.elem_dofs.T].reshape(6, -1, B, C, k)   # (6, E, B, 3, k)
    E = U.shape[1]
    # component-split: (6, E, B, 3, k) -> 3 x (6, E, B*k)
    Us = jnp.transpose(U, (3, 0, 1, 2, 4)).reshape(C, 6, E, BK)
    Uc = [[Us[c, i] for i in range(6)] for c in range(C)]

    gpx = qs.gp[..., 0]                              # (E, Q, 6)
    gpy = qs.gp[..., 1]
    Nq = np.asarray(_N_REF)
    Qn = Nq.shape[0]
    b = jnp.repeat(betas, k)[None, :]                # (1, BK) lane vec
    # per-(E,B) weights expanded to (E, BK) lanes, outside the q loop
    ie_rep = [jnp.repeat(qs.inv_eps[:, :, q].T, k, axis=1)
              for q in range(Qn)]                    # (E, BK) each

    Y = [[None] * 6 for _ in range(C)]
    for q in range(Qn):
        gx = gpx[:, q, :]                            # (E, 6)
        gy = gpy[:, q, :]
        V = [sum(float(Nq[q, i]) * Uc[c][i] for i in range(6))
             for c in range(C)]
        Gx = [sum(gx[:, i, None] * Uc[c][i] for i in range(6))
              for c in range(C)]
        Gy = [sum(gy[:, i, None] * Uc[c][i] for i in range(6))
              for c in range(C)]
        c1 = Gy[2] - b * V[1]
        c2 = b * V[0] - Gx[2]
        c3 = Gx[1] - Gy[0]
        dv = Gx[0] + Gy[1] - b * V[2]

        we = qs.w[:, q, None] * ie_rep[q]            # (E, BK)
        wa = (qs.w[:, q] * alpha)[:, None]
        c1h = we * c1
        c2h = we * c2
        c3h = we * c3
        dvh = wa * dv

        S = (b * c2h, -b * c1h, -b * dvh)
        Tx = (dvh, c3h, -c2h)
        Ty = (-c3h, dvh, c1h)
        for c in range(C):
            for i in range(6):
                t = (float(Nq[q, i]) * S[c]
                     + gx[:, i, None] * Tx[c]
                     + gy[:, i, None] * Ty[c])
                Y[c][i] = t if Y[c][i] is None else Y[c][i] + t
    # (3, 6, E, BK) -> (E, 6, B, 3, k) -> (E, 6, L)
    Ys = jnp.stack([jnp.stack(Y[c], axis=0) for c in range(C)], axis=0)
    Ye = jnp.transpose(Ys.reshape(C, 6, E, B, k), (2, 1, 3, 0, 4))
    Yd = _accumulate_fused(Ye.reshape(E, 6, L), gs) * m
    pk = jnp.broadcast_to(parks[None, :, None, None], Xf.shape) \
        .reshape(D, L)
    return (Yd + pk * (Xl - Xm)).reshape(D, B, C, k)


base = jax.jit(lambda x: kernels._apply_vector3_fused(
    qs, gs, mask, parks, betas, alpha, x))
v2 = jax.jit(lambda x: apply_v2(qs, gs, mask, parks, betas, alpha, x))

y0 = jax.block_until_ready(base(Xf))
y2 = jax.block_until_ready(v2(Xf))
err = float(jnp.abs(y0 - y2).max() / (jnp.abs(y0).max() + 1e-30))
print(f"v2 vs base rel err: {err:.2e}", flush=True)
assert err < 2e-6, err


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:24s} {dt:8.2f} ms", flush=True)
    return dt


tb = bench("A apply (base)", base, Xf)
tv = bench("A apply (v2 flat)", v2, Xf)
print(f"speedup {tb / tv:.2f}x", flush=True)
print("DONE", flush=True)
