"""f64 host-side operator machinery: family views vs direct assembly.

The sweep polish consumes per-design operators ONLY through
LazyVector3.Ai_matvec (family-shared scratch + zero-copy CSR views);
these tests pin that path to the instantiated and directly-assembled
operators, with and without a member interface-annulus correction.
Reference analog: the per-design ARPACK assembly loop
(/root/reference/solver_fem.py:129-175) that the family precompute
replaces.
"""
import numpy as np
import pytest

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.host_assembly import (build_host_vector3,
                                          build_host_vector3_family,
                                          quadratic_subspace)


@pytest.fixture(scope="module")
def fam_setup():
    cfg = SimulationConfig(mesh_min_points=900, mesh_target_points=900,
                           mesh=MeshConfig(bucket_rounding=256),
                           solver=SolverConfig(backend="tpu"))
    base = MCFGeometry(3, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
    member = MCFGeometry(3, 8.0, 1.5 * 1.02, 1.535, 1.0,
                         wavelength_um=1.55)
    grid = MeshGenerator.generate(base, 1.0, cfg)
    dg = export_device_grid(grid, 256)
    fam = build_host_vector3_family(dg, base.eps_params())
    rng = np.random.default_rng(0)
    V = rng.standard_normal((fam.M3.shape[0], 5))
    return dg, fam, base, member, V


def test_design_view_matches_instantiate(fam_setup):
    dg, fam, base, member, V = fam_setup
    for tag, g in (("base", base), ("member", member)):
        ep = g.eps_params() if tag == "member" else None
        hv = fam.instantiate(g.n_core**2, g.n_clad**2, eps_params=ep)
        lv = fam.design_view(g.n_core**2, g.n_clad**2, eps_params=ep)
        P = hv.Ai_matvec(V)
        L = lv.Ai_matvec(V)
        for i in range(3):
            scale = np.abs(P[i]).max() + 1e-300
            assert np.abs(P[i] - L[i]).max() / scale < 1e-13, (tag, i)
        if lv.Mim is None:
            assert hv.Mim is None
        else:
            d = lv.Mim - hv.Mim
            assert d.nnz == 0 or np.abs(d.data).max() < 1e-14


def test_family_base_matches_direct_assembly(fam_setup):
    dg, fam, base, _, V = fam_setup
    hv0 = build_host_vector3(dg, base.eps_params())
    lv = fam.design_view(base.n_core**2, base.n_clad**2)
    P = hv0.Ai_matvec(V)
    L = lv.Ai_matvec(V)
    for i in range(3):
        scale = np.abs(P[i]).max() + 1e-300
        assert np.abs(P[i] - L[i]).max() / scale < 1e-10, i


def test_scratch_views_retarget_between_designs(fam_setup):
    """Two designs polished back-to-back through the SAME scratch must
    not leak each other's operator data (the zero-copy CSR views are
    refilled in place)."""
    dg, fam, base, member, V = fam_setup
    lv1 = fam.design_view(base.n_core**2, base.n_clad**2)
    lv2 = fam.design_view(member.n_core**2, member.n_clad**2,
                          eps_params=member.eps_params())
    a1 = lv1.Ai_matvec(V)[0].copy()
    _ = lv2.Ai_matvec(V)
    a1_again = lv1.Ai_matvec(V)[0]
    assert np.array_equal(a1, a1_again)


def test_quadratic_subspace_accepts_both_views(fam_setup):
    dg, fam, base, member, _ = fam_setup
    g = member
    ep = g.eps_params()
    hv = fam.instantiate(g.n_core**2, g.n_clad**2, eps_params=ep)
    lv = fam.design_view(g.n_core**2, g.n_clad**2, eps_params=ep)
    # seed with mass-smoothed random vectors so the projected pencil
    # has in-window roots
    rng = np.random.default_rng(1)
    X = rng.standard_normal((fam.M3.shape[0], 8))
    k0 = g.k0
    lo, hi = k0 * 1.0 * (1 + 1e-9), k0 * g.n_core * 1.01
    bt_h, H_h, _, q_h = quadratic_subspace(hv, X, k0, lo, hi)
    bt_l, H_l, _, q_l = quadratic_subspace(lv, X, k0, lo, hi)
    assert np.allclose(bt_h, bt_l, rtol=1e-12, atol=0)
    assert np.allclose(q_h, q_l, rtol=1e-9, atol=1e-15)
