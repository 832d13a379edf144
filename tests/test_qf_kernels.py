"""Quadrature-factor matrix-free applies vs materialized element blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops.assembly import (
    assemble_vector3_qf,
    assemble_vector3_system,
    eps_arrays,
    gather_scatter,
    grid_to_device,
    vector3_stacked_A,
)
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid


@pytest.fixture(scope="module")
def setup():
    # straight-interface mesh: the single-design QF path reconstructs
    # gradients from the AFFINE per-element J (QFactor.invJT) and is
    # kept for reference/microbenchmarks only — the production sweep
    # path (QFactorSweep.gp) uses the per-quadrature-point tables and
    # supports curved isoparametric interface elements
    cfg = SimulationConfig(mesh_min_points=200, mesh_target_points=900,
                           mesh=MeshConfig(bucket_rounding=128,
                                           curved_interfaces=False))
    geom = MCFGeometry(3, 8.0, 1.3, 1.53, 1.0, wavelength_um=1.55)
    MeshGenerator.clear_cache()
    grid = MeshGenerator.generate(geom, 0.35, cfg)
    dg = export_device_grid(grid, 128)
    ga = grid_to_device(dg, dtype=jnp.float32)
    ea = eps_arrays(geom.eps_params(), dtype=jnp.float32)
    return geom, dg, ga, ea


def test_qf_apply_matches_blocks(setup):
    """A(beta) X identical between qf and materialized-blocks applies."""
    geom, dg, ga, ea = setup
    beta = jnp.float32(5.9)
    alpha = jnp.float32(1.0)
    prim, diag_blocks, _ = assemble_vector3_system(ga, ea)
    big = vector3_stacked_A(prim, beta, alpha)
    qf, diag_qf = assemble_vector3_qf(ga, ea)
    gs = gather_scatter(ga)
    mask = ga.interior_mask

    Dp = dg.n_dofs_padded
    X = jax.random.normal(jax.random.PRNGKey(0), (3 * Dp, 5),
                          dtype=jnp.float32)
    park = jnp.float32(100.0)
    Y_blocks = kernels._apply_stacked(big, gs, mask, park, X, 3)
    Y_qf = kernels._apply_vector3_qf(qf, gs, mask, park, beta, alpha, X)
    scale = float(jnp.abs(Y_blocks).max())
    np.testing.assert_allclose(np.asarray(Y_qf), np.asarray(Y_blocks),
                               atol=3e-5 * scale)

    # mass applies and diagonals agree too
    Yb = kernels._apply_mass(prim["u_nn"], gs, mask, X, 3)
    Yq = kernels._apply_mass_qf(qf, gs, mask, X, 3)
    np.testing.assert_allclose(np.asarray(Yq), np.asarray(Yb),
                               atol=1e-5 * float(jnp.abs(Yb).max()))
    np.testing.assert_allclose(np.asarray(diag_qf), np.asarray(diag_blocks),
                               rtol=2e-5)


def test_sweep_matches_single_design(setup):
    """Packed same-grid sweep reproduces per-design solves."""
    from pl_fem_tpu.config import SolverConfig
    from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

    geom, dg, ga, ea = setup
    # beta_passes=2 lets the qres-gated outer loop converge each
    # path's root; at one round the two paths' different random
    # subspaces land ~5e-4 apart on this coarse mesh (deg 100)
    cfg = SimulationConfig(solver=SolverConfig(
        backend="tpu", cheb_degree=100, cheb_passes=3, beta_passes=2))
    geoms = [
        MCFGeometry(3, 8.0, 1.3, 1.53, 1.0, wavelength_um=1.55),
        MCFGeometry(3, 8.0, 1.3, 1.55, 1.0, wavelength_um=1.60),
    ]
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 5, cfg)
    assert len(sweep) == 2
    assert len(sweep[1]) >= 4
    # per-design parity against one independent single-design solve
    g = geoms[0]
    single = TrueVectorialMaxwellSolver(g, config=cfg) \
        .solve_vectorial_modes(dg, 5)
    ns = [m["n_eff"] for m in sweep[0]][:4]
    n1 = [m["n_eff"] for m in single][:4]
    # mechanics check only: on this 200-point mesh at deg 100 the two
    # paths' solver scatter is ~5-7e-4 (and varies with which XLA CPU
    # executables the compile cache serves); production-scale
    # cross-path agreement is gated at ~2e-6 in docs/PARITY_r2.md
    np.testing.assert_allclose(ns, n1, atol=1.5e-3)


def test_binv_auto_fast_mode_matches_binv4():
    """The AUTO B^{-1} policy: in bootstrapped fast mode (beta_passes=1
    with a two-grid seed) binv resolves to the cheap semi-iteration
    (binv=1) and must land in the same n_eff class as the deep
    Chebyshev B^{-1} (binv=4) — the shallow inverse only steers an
    already-warm subspace; the Rayleigh-Ritz tail and the host f64
    polish always use the TRUE consistent-mass pencil. Measured here
    (19k DOFs, CPU): ~5e-4 apart at ~2x less cost. From a COLD start
    binv=1 loses ~6e-3 (subspace never converges), which is why AUTO
    requires the bootstrap seed — the sweep-vs-single tests cover that
    cold path with binv resolving to 4. (binv=0, the exact HRZ-lumped
    inverse, is deliberately NOT gated here: its spectrum distortion
    lets grid-rough junk below the guided cluster — measured 5e-2
    n_eff error and junk modes at production scale — experimental
    knob only.)"""
    from pl_fem_tpu.config import MeshConfig, SolverConfig
    from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
    from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

    geom = MCFGeometry(3, 8.0, 1.3, 1.53, 1.0, wavelength_um=1.55)
    # large enough that the two-grid bootstrap engages (>= 6000 DOFs
    # with a valid ~3x-coarser seed grid)
    cfgm = SimulationConfig(mesh_min_points=2500, mesh_target_points=2500,
                            mesh=MeshConfig(bucket_rounding=256))
    grid = MeshGenerator.generate(geom, 0.6, cfgm)
    dg = export_device_grid(grid, 256)
    assert grid.n_dofs >= 6000
    out = {}
    for binv in (4, None):
        cfg = SimulationConfig(
            mesh=MeshConfig(bucket_rounding=256),
            solver=SolverConfig(backend="tpu", cheb_degree=100,
                                cheb_passes=2, beta_passes=1,
                                binv_degree=binv))
        out[binv] = TrueVectorialMaxwellSolver.solve_sweep([geom], dg, 5,
                                                           cfg)[0]
    assert len(out[None]) >= 4 and len(out[4]) >= 4
    ns_auto = [m["n_eff"] for m in out[None]][:4]
    ns_deep = [m["n_eff"] for m in out[4]][:4]
    # same solver-scatter class as the sweep-vs-single gate;
    # production-scale truth gates live in the PARITY docs
    np.testing.assert_allclose(ns_auto, ns_deep, atol=1.5e-3)


def test_qf_solver_end_to_end(setup):
    """solve_lowest_qf finds the same lowest spectrum as the blocks path."""
    geom, dg, ga, ea = setup
    from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate

    k0 = float(geom.k0)
    beta0 = k0 * lp01_neff_estimate(k0, 1.3, geom.n_core, geom.n_clad)
    prim, diag, _ = assemble_vector3_system(ga, ea)
    big = vector3_stacked_A(prim, jnp.float32(beta0), jnp.float32(1.0))
    _, _, bound = kernels.pencil_bounds_elem(big, prim["u_nn"],
                                             ga.elem_valid, C=3)
    cut = min(beta0**2 / geom.n_clad**2, 1.35 * k0**2)
    park = 10.0 * cut
    gs = gather_scatter(ga)
    Dp = dg.n_dofs_padded
    X0 = jax.random.normal(jax.random.PRNGKey(3), (3 * Dp, 8),
                           dtype=jnp.float32)

    th_q, _, _ = kernels.solve_lowest_qf(
        qf=assemble_vector3_qf(ga, ea)[0], gs=gs, mask=ga.interior_mask,
        diag_B=diag, X0=X0, cut=cut, beta=beta0, alpha=1.0,
        bound=float(bound) * 1.3, degree=100, passes=4, park=park,
        n_wanted=4)
    th_b, _, _ = kernels.solve_lowest_kernel(
        big, prim["u_nn"], gs, ga.interior_mask, diag, X0, cut,
        ga.elem_valid, C=3, degree=100, passes=4, park=park, n_wanted=4)
    # both paths converge the leading (well-separated) group; trailing
    # Ritz directions are iteration-path dependent until full convergence
    tq = np.asarray(th_q)[:3]
    tb = np.asarray(th_b)[:3]
    np.testing.assert_allclose(tq, tb, rtol=3e-3)
