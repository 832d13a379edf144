"""Unit check: family 'deform' correction == direct assembly on the
deformed (member-conforming) grid.

Builds a small class mesh for a 7-core MCF, a member whose radius is
+2% off the class radius, and compares:
  (a) family.instantiate(..., eps_params=member, correction='deform')
  (b) build_host_vector3 on a DeviceGrid whose node coords were
      deformed by member_deformed_coords (the ground truth).
Also checks the M3 correction and the LazyVector3 Ai_matvec path.

Run: python scratch/geomcorr_check.py   (CPU, ~1 min)
"""
import copy
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from pl_fem_tpu.config import SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.host_assembly import (
    build_host_vector3,
    build_host_vector3_family,
    member_deformed_coords,
)

cfg = SimulationConfig(mesh_min_points=1500, mesh_target_points=2500)
cls_geom = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
member = MCFGeometry(7, 8.0, 1.5 * 1.02, 1.536, 1.0, wavelength_um=1.55)

grid = MeshGenerator.generate(cls_geom, 1.0, cfg)
dg = export_device_grid(grid, 256)
print(f"mesh: {grid.n_points} pts {grid.n_dofs} dofs, circles "
      f"{None if dg.circles is None else dg.circles.shape}")

fam = build_host_vector3_family(dg, cls_geom.eps_params())
ep_m = member.eps_params()

corr = fam._corr_for(ep_m, "deform")
assert corr is not None and corr[0] == "geom", f"no geom corr: {corr!r}"
print(f"geom correction: {len(corr[1])} slots, M3corr nnz "
      f"{corr[3].nnz}")
hv_corr = fam.instantiate(member.n_core**2, member.n_clad**2,
                          eps_params=ep_m, correction="deform")

# ground truth: direct assembly on the deformed grid
out = member_deformed_coords(dg.dof_coords, dg.circles[:, :2],
                             dg.circles[:, 2],
                             np.asarray(ep_m.core_radii))
assert out is not None
coords_def, moved = out
print(f"moved nodes: {moved[:dg.n_dofs].sum()} / {dg.n_dofs}")
grid_d = copy.deepcopy(grid)
grid_d.dof_coords[:] = coords_def[: grid.n_dofs]
grid_d.mesh.points[:] = coords_def[: grid.n_points]
dg_d = export_device_grid(grid_d, 256)
hv_ref = build_host_vector3(dg_d, ep_m)

for name in ("d0", "d1", "d2"):
    a = getattr(hv_corr, name)
    b = getattr(hv_ref, name)
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-300)
    print(f"{name}: max rel diff {rel:.3e}")
    assert rel < 1e-12, name
dM = np.abs((hv_corr.M3 - hv_ref.M3).data).max() if (
    hv_corr.M3 - hv_ref.M3).nnz else 0.0
print(f"M3: max abs diff {dM:.3e} (scale {np.abs(hv_ref.M3.data).max():.3e})")
assert dM < 1e-12 * np.abs(hv_ref.M3.data).max()

# lazy view path
lv = fam.design_view(member.n_core**2, member.n_clad**2, eps_params=ep_m,
                     correction="deform")
rng = np.random.default_rng(0)
V = rng.standard_normal((3 * dg.n_dofs, 4))
for (la, ra) in zip(lv.Ai_matvec(V), hv_ref.Ai_matvec(V)):
    rel = np.abs(la - ra).max() / max(np.abs(ra).max(), 1e-300)
    print(f"Ai_matvec rel {rel:.3e}")
    assert rel < 1e-11
print("PASS")
