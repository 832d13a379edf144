"""Break down HostVector3Family.instantiate's measured ~4.2 s/call at
production mesh (prof_sweep: 16 calls = 66.9 s of the 110.8 s steady
sweep): axpy vs mask-correction vs CSR construction vs SpMV, to size
the lazy-Ai_matvec fix."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.host_assembly import build_host_vector3_family

cfg = SimulationConfig(
    mesh_min_points=15000, mesh_target_points=15000,
    mesh=MeshConfig(bucket_rounding=1024),
    solver=SolverConfig(backend="tpu"))
geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(geom, 2.2, cfg)
dg = export_device_grid(grid, 1024)
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs", flush=True)

t0 = time.time()
fam = build_host_vector3_family(dg, geom.eps_params())
print(f"family build {time.time()-t0:.1f}s  nnz={len(fam.pat.indices)}",
      flush=True)

ic, il = 1.0 / geom.n_core**2, 1.0 / geom.n_clad**2

# (a) the raw axpy
for _ in range(2):
    t0 = time.time()
    d = ic * fam.d_core + il * fam.d_clad + fam.d_u
    t_axpy = time.time() - t0
print(f"axpy (3,{fam.d_core.shape[1]}) f64: {t_axpy:.2f}s", flush=True)

# (a') in-place single-buffer variant
out = np.empty_like(fam.d_u)
for _ in range(2):
    t0 = time.time()
    np.multiply(fam.d_core, ic, out=out)
    tmp = il * fam.d_clad
    out += tmp
    out += fam.d_u
    t_axpy2 = time.time() - t0
print(f"axpy in-place: {t_axpy2:.2f}s", flush=True)

# (b) mask correction (same layout -> diff should be empty)
t0 = time.time()
corr = fam._mask_correction(geom.eps_params())
print(f"mask_correction (no-diff layout): {time.time()-t0:.2f}s -> "
      f"{'None' if corr is None else corr.shape}", flush=True)

# (b') mask correction with a genuinely shifted member
g2 = MCFGeometry(7, 8.0, 1.5 * 1.025, 1.535, 1.0, wavelength_um=1.55)
t0 = time.time()
corr2 = fam._mask_correction(g2.eps_params())
print(f"mask_correction (band-edge member): {time.time()-t0:.2f}s", flush=True)

# (c) CSR construction from data triple
hv = fam.instantiate(geom.n_core**2, geom.n_clad**2)
t0 = time.time()
A0, A1, A2 = hv.Ai()
t_csr = time.time() - t0
print(f"Ai() CSR construction: {t_csr:.2f}s", flush=True)

# (d) full instantiate, timed
for _ in range(2):
    t0 = time.time()
    fam.instantiate(geom.n_core**2, geom.n_clad**2)
    t_inst = time.time() - t0
print(f"instantiate (no eps_params): {t_inst:.2f}s", flush=True)
t0 = time.time()
fam.instantiate(g2.n_core**2, g2.n_clad**2, eps_params=g2.eps_params())
print(f"instantiate (band-edge, cold corr): {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
fam.instantiate(g2.n_core**2, g2.n_clad**2, eps_params=g2.eps_params())
print(f"instantiate (band-edge, warm corr): {time.time()-t0:.2f}s", flush=True)

# (e) SpMV cost at polish width
n3 = fam.M3.shape[0]
V = np.random.default_rng(0).standard_normal((n3, 22))
K = sp.csr_matrix((fam.d_u[0], fam.pat.indices, fam.pat.indptr),
                  shape=fam.pat.shape)
t0 = time.time()
KV = K @ V
print(f"one family SpMV (m=22): {time.time()-t0:.3f}s", flush=True)
t0 = time.time()
for j in range(9):
    K @ V
print(f"9 SpMVs (lazy Ai_matvec cost/call): {(time.time()-t0):.2f}s",
      flush=True)
