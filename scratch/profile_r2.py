"""Round-2 perf profile: phase timing of the packed sweep at bench size.

Usage: nohup python -u scratch/profile_r2.py > /tmp/prof_r2.log 2>&1 &
Env: PROF_MESH_MIN (default 2500), PROF_SWEEP (default 8).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

MESH_MIN = int(os.environ.get("PROF_MESH_MIN", "2500"))
N_SWEEP = int(os.environ.get("PROF_SWEEP", "8"))
N_MODES = 10

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf,
                                     assemble_vector3_system, eps_arrays,
                                     gather_scatter, grid_to_device,
                                     vector3_stacked_A)
from pl_fem_tpu.ops.host_assembly import (build_host_vector3_family,
                                          quadratic_subspace)
from pl_fem_tpu.ops.kernels import (QFactorSweep, cheb_rr_pass_sweep,
                                    pencil_bounds_elem)
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

t_last = time.time()


def t(label):
    global t_last
    now = time.time()
    print(f"[{now - t_last:8.2f}s] {label}", flush=True)
    t_last = now


def make_geom(wl):
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=wl)


cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024),
                       solver=SolverConfig(backend="tpu"))
geom0 = make_geom(1.55)
grid = MeshGenerator.generate(geom0, 0.7, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh: {grid.n_points} pts {grid.n_dofs} dofs bucket={dg.bucket}")
t("mesh+export")

wls = np.linspace(1.50, 1.64, N_SWEEP)
geoms = [make_geom(float(w)) for w in wls]
B = len(geoms)
n = dg.n_dofs
Dp = dg.n_dofs_padded

ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)
invs = []
for g in geoms:
    qf_g, diag = assemble_vector3_qf(ga, eps_arrays(g.eps_params(),
                                                    dtype=jnp.float32))
    invs.append(qf_g.inv_eps)
qs = QFactorSweep(invJT=qf_g.invJT, w=qf_g.w, inv_eps=jnp.stack(invs),
                  gp=ga.grad_phys)
jax.block_until_ready(qs.inv_eps)
t("device assembly (qf)")

betas = np.array([g.k0 * lp01_neff_estimate(g.k0,
                                            float(np.mean(g.core_radii)),
                                            g.n_core, g.n_clad)
                  for g in geoms])
cuts = np.array([min(b**2 / g.n_clad**2, 1.35 * g.k0**2)
                 for b, g in zip(betas, geoms)])
parks = 10.0 * np.maximum(cuts, 1.0)

bounds = np.empty(B)
for bix, g in enumerate(geoms):
    prim, _, _ = assemble_vector3_system(ga, eps_arrays(g.eps_params(),
                                                        dtype=jnp.float32))
    big0 = vector3_stacked_A(prim, jnp.float32(betas[bix]), jnp.float32(1.0))
    _, _, bound = pencil_bounds_elem(big0, prim["u_nn"], ga.elem_valid, C=3)
    bounds[bix] = float(bound) * 1.1
del big0, prim
print(f"bounds: {bounds.min():.1f}..{bounds.max():.1f}  "
      f"cuts: {cuts.min():.3f}..{cuts.max():.3f}  "
      f"ratio bound/cut: {(bounds / cuts).mean():.0f}")
t("per-design bounds")

family = build_host_vector3_family(dg, geom0.eps_params(), 1.0)
t("host family build")

k = N_MODES + 12
X = jax.random.normal(jax.random.PRNGKey(11), (3 * Dp, B, k),
                      dtype=jnp.float32)
mask3 = np.tile(dg.interior_mask[:n], 3).astype(np.float64)

lo = jnp.asarray(0.04, jnp.float32)
hi = jnp.asarray(2.2, jnp.float32)
from pl_fem_tpu.ops.kernels import MASS_HI, MASS_LO

lo = jnp.asarray(MASS_LO, jnp.float32)
hi = jnp.asarray(MASS_HI, jnp.float32)
dinv_sqrt = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)

cuts_j = jnp.asarray(cuts, jnp.float32)
betas_j = jnp.asarray(betas, jnp.float32)
parks_j = jnp.asarray(parks, jnp.float32)
bounds_j = jnp.asarray(np.maximum(bounds, parks * 1.05), jnp.float32)

# compile probe at two degrees to get per-step cost
for deg in (50, 300):
    out = cheb_rr_pass_sweep(qs, gs, ga.interior_mask, dinv_sqrt, lo, hi,
                             parks_j, betas_j, jnp.float32(1.0), X, cuts_j,
                             bounds_j, degree=deg, binv_degree=4)
    jax.block_until_ready(out)
    t(f"compile+run degree={deg}")
    t0 = time.time()
    out = cheb_rr_pass_sweep(qs, gs, ga.interior_mask, dinv_sqrt, lo, hi,
                             parks_j, betas_j, jnp.float32(1.0), X, cuts_j,
                             bounds_j, degree=deg, binv_degree=4)
    jax.block_until_ready(out)
    print(f"   steady-state degree={deg}: {time.time() - t0:.3f}s")
    t(f"steady run degree={deg}")

# full pass loop like solve_lowest_sweep, with residual trace
Xc = X
for ip in range(4):
    t0 = time.time()
    theta, Xr, res = cheb_rr_pass_sweep(qs, gs, ga.interior_mask, dinv_sqrt,
                                        lo, hi, parks_j, betas_j,
                                        jnp.float32(1.0), Xc, cuts_j,
                                        bounds_j, degree=300, binv_degree=4)
    jax.block_until_ready(theta)
    th = np.asarray(theta)
    rs = np.asarray(res)
    wanted = th < cuts[:, None]
    mres = rs[wanted].max() if wanted.any() else rs.min()
    print(f"pass {ip}: {time.time() - t0:.2f}s maxres={mres:.2e} "
          f"wanted={wanted.sum()}")
    Xc = Xr
t("4 filter passes (degree 300)")

# host polish per design
Xh_all = np.asarray(Xc, dtype=np.float64)
t("device->host transfer")
for bix, g in enumerate(geoms[:3]):
    t0 = time.time()
    Xh = Xh_all[:, bix, :]
    Xh = np.concatenate([Xh[c * Dp:c * Dp + n] for c in range(3)],
                        axis=0) * mask3[:, None]
    hv = family.instantiate(g.n_core**2, g.n_clad**2)
    bts, H, _, qres = quadratic_subspace(
        hv, Xh, g.k0, g.k0 * g.n_clad * (1 + 1e-9), g.k0 * g.n_core * 1.01,
        mask=mask3)
    print(f"polish design {bix}: {time.time() - t0:.2f}s "
          f"n_betas={len(bts)} qres_max="
          f"{qres.max() if len(qres) else -1:.2e}")
t("host polish x3")
print("DONE")
