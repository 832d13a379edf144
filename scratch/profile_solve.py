"""Phase-level timing of one vectorial TPU solve (warm kernels)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.assembly import (assemble_vector3_system, eps_arrays,
                                     gather_scatter, grid_to_device,
                                     vector3_stacked_A)
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops import host_assembly as ha
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

cfg = SimulationConfig(mesh_min_points=2500, mesh_target_points=10000,
                       mesh=MeshConfig(bucket_rounding=1024),
                       solver=SolverConfig(cheb_degree=300, cheb_passes=2,
                                           beta_passes=1))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 0.7, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_dofs} dofs bucket={dg.bucket}", flush=True)

def t(tag, t0):
    dt = time.time() - t0
    print(f"  {tag}: {dt*1000:.0f} ms", flush=True)
    return time.time()

for it in range(3):
    print(f"--- iteration {it} ---", flush=True)
    t0 = time.time()
    ga = grid_to_device(dg, dtype=jnp.float32)
    jax.block_until_ready(ga.qp_xy)
    t0 = t("grid_to_device", t0)
    ea = eps_arrays(geom.eps_params(), dtype=jnp.float32)
    prim, diag, _ = assemble_vector3_system(ga, ea)
    jax.block_until_ready(diag)
    t0 = t("assemble_vector3 (device)", t0)
    k0 = float(geom.k0)
    beta0 = k0 * lp01_neff_estimate(k0, 1.5, geom.n_core, geom.n_clad)
    big = vector3_stacked_A(prim, jnp.float32(beta0), jnp.float32(1.0))
    jax.block_until_ready(big)
    t0 = t("stacked_A (device)", t0)

    hv = ha.build_host_vector3(dg, geom.eps_params(), 1.0)
    t0 = t("build_host_vector3 (host)", t0)

    cut = min(beta0**2 / geom.n_clad**2, 1.35 * k0**2)
    park = 10.0 * cut
    gs = gather_scatter(ga)
    X = jax.random.normal(jax.random.PRNGKey(1), (3 * dg.n_dofs_padded, 22),
                          dtype=jnp.float32)
    lo, hi, bound = kernels.pencil_bounds_elem(big, prim["u_nn"],
                                               ga.elem_valid, C=3)
    jax.block_until_ready(bound)
    t0 = t("bounds (device)", t0)
    ds = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
    bound32 = jnp.maximum(bound, park * 1.05).astype(jnp.float32)
    for ip in range(4):
        th, X, res = kernels.cheb_rr_pass(
            big, prim["u_nn"], gs, ga.interior_mask, ds,
            lo, hi, jnp.float32(park), X, jnp.float32(cut), bound32,
            C=3, degree=300)
        jax.block_until_ready(X)
        tha = np.asarray(th); rsa = np.asarray(res)
        w = (tha < cut) & (np.arange(len(tha)) < 22)
        t0 = t(f"cheb_rr_pass {ip} (maxres={rsa[w].max() if w.any() else -1:.1e})", t0)

    Xh = np.asarray(X, dtype=np.float64)
    n = dg.n_dofs
    Dp = dg.n_dofs_padded
    Xh = np.concatenate([Xh[c*Dp:c*Dp+n] for c in range(3)], axis=0)
    mask3 = np.tile(dg.interior_mask[:n], 3).astype(float)
    Xh *= mask3[:, None]
    t0 = t("X transfer+slice (host)", t0)
    betas, H, V, qres = ha.quadratic_subspace(hv, Xh, k0,
                                              k0 * 1.0001, k0 * 1.552,
                                              mask=mask3)
    t0 = t(f"quadratic_subspace (host, {len(betas)} roots)", t0)
