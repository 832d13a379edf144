"""LazyVector3.Ai_matvec must equal instantiate().Ai() products, with
and without a member mask-correction."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.host_assembly import (build_host_vector3,
                                          build_host_vector3_family,
                                          quadratic_subspace)

cfg = SimulationConfig(mesh_min_points=1200, mesh_target_points=1200,
                       mesh=MeshConfig(bucket_rounding=256),
                       solver=SolverConfig(backend="tpu"))
base = MCFGeometry(3, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
member = MCFGeometry(3, 8.0, 1.5 * 1.02, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(base, 1.0, cfg)
dg = export_device_grid(grid, 256)
fam = build_host_vector3_family(dg, base.eps_params())
rng = np.random.default_rng(0)
V = rng.standard_normal((fam.M3.shape[0], 5))

for tag, g in (("base", base), ("member", member)):
    ep = g.eps_params() if tag == "member" else None
    hv = fam.instantiate(g.n_core**2, g.n_clad**2, eps_params=ep)
    lv = fam.design_view(g.n_core**2, g.n_clad**2, eps_params=ep)
    P = hv.Ai_matvec(V)
    L = lv.Ai_matvec(V)
    for i in range(3):
        err = np.abs(P[i] - L[i]).max() / (np.abs(P[i]).max() + 1e-300)
        assert err < 1e-14, (tag, i, err)
    # exact-vs-family for the base layout
    if tag == "base":
        hv0 = build_host_vector3(dg, base.eps_params())
        Q = hv0.Ai_matvec(V)
        for i in range(3):
            err = np.abs(P[i] - Q[i]).max() / (np.abs(Q[i]).max() + 1e-300)
            assert err < 1e-10, ("exact", i, err)
    if lv.Mim is None:
        assert hv.Mim is None
    else:
        d = lv.Mim - hv.Mim
        assert d.nnz == 0 or np.abs(d.data).max() < 1e-14
    # polish parity through quadratic_subspace
    k0 = 2 * np.pi / g.wavelength
    b_lo, b_hi = k0 * 1.0 * (1 + 1e-9), k0 * g.n_core * 1.01
    bt_h, H_h, _, q_h = quadratic_subspace(hv, V, k0, b_lo, b_hi)
    bt_l, H_l, _, q_l = quadratic_subspace(lv, V, k0, b_lo, b_hi)
    assert np.allclose(bt_h, bt_l, rtol=1e-12, atol=0)
    assert np.allclose(q_h, q_l, rtol=1e-9, atol=1e-15)
    print(f"{tag}: OK ({len(bt_h)} roots)", flush=True)
print("lazy view parity: ALL OK", flush=True)
