"""Batched-pass scaling: time per design vs batch size on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.parallel import assemble_design_batch, batched_solve

cfg = SimulationConfig(mesh_min_points=2500, mesh_target_points=10000,
                       mesh=MeshConfig(bucket_rounding=1024))
wls = np.linspace(1.50, 1.64, 16)
geoms = [MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
         for w in wls]
grid = MeshGenerator.generate(geoms[0], 0.7, cfg)
dgs = [export_device_grid(grid, 1024) for _ in geoms]
print(f"mesh {grid.n_dofs} dofs bucket={dgs[0].bucket}", flush=True)

for B in (1, 4, 8, 16):
    t0 = time.time()
    batch = assemble_design_batch(geoms[:B], dgs[:B], vectorial=True)
    jax.block_until_ready(batch.Abig)
    t_asm = time.time() - t0
    # warmup compile
    th, X, res = batched_solve(batch, k=22, degree=300, passes=1)
    jax.block_until_ready(X)
    t0 = time.time()
    th, X, res = batched_solve(batch, k=22, degree=300, passes=3, seed=1)
    jax.block_until_ready(X)
    dt = time.time() - t0
    print(f"B={B:3d}: asm={t_asm:.1f}s 3 passes={dt:.1f}s "
          f"-> {dt/3/B*1000:.0f} ms/pass/design", flush=True)
