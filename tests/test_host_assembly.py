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


def test_deform_correction_matches_deformed_grid_assembly(fam_setup):
    """'deform' member correction == direct f64 assembly on the grid
    whose nodes were moved by member_deformed_coords (the member-
    CONFORMING discretization — round-5 fix for the ~1e-4 bucket
    accuracy floor, docs/PARITY_r3.md §A)."""
    import copy

    from pl_fem_tpu.ops.host_assembly import member_deformed_coords

    dg, fam, base, member, V = fam_setup
    ep = member.eps_params()
    corr = fam._corr_for(ep, "deform")
    assert corr is not None and corr[0] == "geom"

    out = member_deformed_coords(dg.dof_coords, dg.circles[:, :2],
                                 dg.circles[:, 2],
                                 np.asarray(ep.core_radii))
    assert out is not None
    coords_def, moved = out
    assert moved[: dg.n_dofs].any()
    cfg = SimulationConfig(mesh_min_points=900, mesh_target_points=900,
                           mesh=MeshConfig(bucket_rounding=256))
    grid = MeshGenerator.generate(base, 1.0, cfg)
    grid_d = copy.deepcopy(grid)
    grid_d.dof_coords[:] = coords_def[: grid.n_dofs]
    grid_d.mesh.points[:] = coords_def[: grid.n_points]
    dg_d = export_device_grid(grid_d, 256)
    hv_ref = build_host_vector3(dg_d, ep)

    lv = fam.design_view(member.n_core**2, member.n_clad**2,
                         eps_params=ep, correction="deform")
    P = hv_ref.Ai_matvec(V)
    L = lv.Ai_matvec(V)
    for i in range(3):
        scale = np.abs(P[i]).max() + 1e-300
        assert np.abs(P[i] - L[i]).max() / scale < 1e-12, i
    dM = lv.M3 - hv_ref.M3
    assert dM.nnz == 0 or np.abs(dM.data).max() < 1e-13


def test_corr_does_not_corrupt_shared_pattern(fam_setup):
    """Regression: building a member correction must not mutate the
    cached SharedCSR pattern (eliminate_zeros on a CSR sharing the
    pattern's indices/indptr compacted them IN PLACE)."""
    dg, fam, base, member, V = fam_setup
    spat_indices = fam.spat.indices.copy()
    spat_indptr = fam.spat.indptr.copy()
    pat_indices = fam.pat.indices.copy()
    _ = fam._corr_for(member.eps_params(), "deform")
    assert np.array_equal(fam.spat.indices, spat_indices)
    assert np.array_equal(fam.spat.indptr, spat_indptr)
    assert np.array_equal(fam.pat.indices, pat_indices)


def test_mask_correction_still_available(fam_setup):
    """correction='mask' keeps the round-3 indicator-only behavior."""
    dg, fam, base, member, V = fam_setup
    ep = member.eps_params()
    corr = fam._corr_for(ep, "mask")
    assert corr is not None and corr[0] == "mask"
    lv = fam.design_view(member.n_core**2, member.n_clad**2,
                         eps_params=ep, correction="mask")
    # mask correction keeps the family's class-geometry mass
    assert lv.M3 is fam.M3
    for a in lv.Ai_matvec(V):
        assert np.isfinite(a).all()
