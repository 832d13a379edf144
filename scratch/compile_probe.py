import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
# NO x64: pure f32 device path
import numpy as np
from pl_fem_tpu.config import SimulationConfig, MeshConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.assembly import (grid_to_device, eps_arrays,
                                     assemble_vector3_system,
                                     vector3_stacked_A)
from pl_fem_tpu.ops import kernels

T0 = time.time()
def t(tag):
    print(f"[{time.time()-T0:6.1f}s] {tag}", flush=True)

geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
cfg = SimulationConfig(mesh_min_points=2000, mesh_target_points=6000,
                       mesh=MeshConfig(bucket_rounding=1024))
grid = MeshGenerator.generate(geom, 0.6, cfg)
dg = export_device_grid(grid, 1024)
t(f"mesh {grid.n_dofs} dofs bucket={dg.bucket}")

ga = grid_to_device(dg, dtype=jnp.float32)
ea = eps_arrays(geom.eps_params(), dtype=jnp.float32)
jax.block_until_ready(ga.qp_xy); t("to device (f32)")
prim, diag, _ = assemble_vector3_system(ga, ea)
jax.block_until_ready(diag); t("assemble_vector3_system f32 (compile+run)")
big = vector3_stacked_A(prim, jnp.float32(6.0), jnp.float32(1.0))
jax.block_until_ready(big); t("stacked_A f32")
lo, hi, bound = kernels.pencil_bounds_elem(big, prim["u_nn"],
                                           ga.elem_valid, C=3)
jax.block_until_ready(bound)
t(f"bounds lo={float(lo):.3f} hi={float(hi):.3f} bound={float(bound):.0f}")
Dp = dg.n_dofs_padded
ds = (1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))).astype(jnp.float32)
X = jax.random.normal(jax.random.PRNGKey(0), (3 * Dp, 22), dtype=jnp.float32)
cut = jnp.float32(22.0)
park = jnp.float32(220.0)
for ip in range(3):
    th, X, res = kernels.cheb_rr_pass(
        big, prim["u_nn"], ga.elem_dofs, ga.interior_mask,
        ds, lo, hi, park, X, cut, jnp.maximum(bound, 230.0),
        C=3, degree=300)
    jax.block_until_ready(X)
    tha = np.asarray(th)
    rsa = np.asarray(res)
    w = tha < 22.0
    t(f"pass {ip}: wanted={w.sum()} maxres={rsa[w].max() if w.any() else -1:.2e}")
t("done")
