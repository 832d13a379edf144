"""Kernel-level parities: alternative apply layouts must agree exactly.

The sweep A-apply has two layouts (PL_FEM_APPLY_LAYOUT): 'packed'
(q-loop on (E, B, 3, k)) and 'flat' (component-split (E, B*k) lanes,
built for TPU tile utilization — scratch/apply_v2.py). They are the
same algebra reassociated, so agreement is near machine precision.
Reference analog: the assembled curl-curl pencil rows the reference
hands to ARPACK (/root/reference/solver_fem.py:129-175).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops import kernels
from pl_fem_tpu.ops.assembly import (assemble_vector3_qf, eps_arrays,
                                     gather_scatter, grid_to_device)
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.kernels import QFactorSweep
from pl_fem_tpu.solvers.vectorial import lp01_neff_estimate


@pytest.fixture(scope="module")
def sweep_setup():
    B, K = 3, 7
    cfg = SimulationConfig(mesh_min_points=400, mesh_target_points=1600,
                           mesh=MeshConfig(bucket_rounding=256))
    geoms = [MCFGeometry(3, 8.0, 1.5, 1.535, 1.0, wavelength_um=float(w))
             for w in np.linspace(1.50, 1.60, B)]
    grid = MeshGenerator.generate(geoms[0], 0.5, cfg)
    dg = export_device_grid(grid, 256)
    ga = grid_to_device(dg, dtype=jnp.float32)
    gs = gather_scatter(ga)
    invs = []
    for g in geoms:
        qf, _ = assemble_vector3_qf(ga, eps_arrays(g.eps_params(),
                                                   dtype=jnp.float32))
        invs.append(qf.inv_eps)
    qs = QFactorSweep(invJT=qf.invJT, w=qf.w, inv_eps=jnp.stack(invs),
                      gp=ga.grad_phys)
    betas = jnp.asarray([g.k0 * lp01_neff_estimate(g.k0, 1.5, g.n_core,
                                                   g.n_clad)
                         for g in geoms], jnp.float32)
    parks = jnp.full((B,), 500.0, jnp.float32)
    D = dg.n_dofs_padded
    Xf = jax.random.normal(jax.random.PRNGKey(3), (D, B, 3, K),
                           jnp.float32)
    return qs, gs, ga.interior_mask, parks, betas, Xf


def test_flat_apply_matches_packed(sweep_setup):
    qs, gs, mask, parks, betas, Xf = sweep_setup
    alpha = jnp.float32(1.0)
    y0 = kernels._apply_vector3_fused(qs, gs, mask, parks, betas, alpha,
                                      Xf)
    y1 = kernels._apply_vector3_flat(qs, gs, mask, parks, betas, alpha,
                                     Xf)
    scale = float(jnp.abs(y0).max())
    assert float(jnp.abs(y0 - y1).max()) / scale < 2e-6


def test_block_accumulate_matches_gather_tables(sweep_setup):
    """ops/blockplan MXU accumulate == gather-sum tables (hi/lo bf16
    selector matmul; tolerance is the 2^-16 split floor)."""
    from pl_fem_tpu.ops.blockplan import build_block_plan, expand_qs

    qs, gs, mask, parks, betas, Xf = sweep_setup
    cfg = SimulationConfig(mesh_min_points=400, mesh_target_points=1600,
                           mesh=MeshConfig(bucket_rounding=256))
    geom = MCFGeometry(3, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
    grid = MeshGenerator.generate(geom, 0.5, cfg)
    dg = export_device_grid(grid, 256)
    plan = build_block_plan(dg, tile=128)
    assert plan is not None
    E = dg.elem_dofs.shape[0]
    L = 36
    Ye = jax.random.normal(jax.random.PRNGKey(5), (E, 6, L), jnp.float32)
    y0 = np.asarray(kernels._accumulate_fused(Ye, gs))       # native
    Ye_slots = jnp.where(jnp.asarray(plan.slot_valid)[:, None, None],
                         Ye[jnp.asarray(plan.slot_src)], 0.0)
    y1 = np.asarray(kernels._accumulate_fused(
        Ye_slots, plan.device_tables()))                     # block order
    nv = dg.n_dofs
    tb, bv = plan.to_blk, plan.blk_valid
    scale = np.abs(y0[:nv]).max() + 1e-30
    assert np.abs(y0[tb[bv]] - y1[bv]).max() / scale < 1e-4
    # slot expansion keeps pad slots at zero weight
    qse = expand_qs(
        kernels.QFactorSweep(invJT=jnp.zeros((E, 2, 2)),
                             w=jnp.ones((E, 4)),
                             inv_eps=jnp.ones((2, E, 4)),
                             gp=jnp.zeros((E, 4, 6, 2))), plan)
    assert float(qse.w.sum()) == float(plan.slot_valid.sum()) * 4


def test_sweep_solve_blk_matches_default(sweep_setup, monkeypatch):
    """End-to-end solve_sweep with PL_FEM_ACC=blk reproduces the
    default accumulate's n_eff (the block path changes data layout and
    the accumulate mechanism, not the math)."""
    from pl_fem_tpu.config import SolverConfig
    from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

    cfg = SimulationConfig(
        mesh_min_points=400, mesh_target_points=1600,
        mesh=MeshConfig(bucket_rounding=256),
        solver=SolverConfig(backend="tpu", cheb_degree=120, cheb_passes=2,
                            beta_passes=1, bootstrap=False))
    geoms = [MCFGeometry(3, 8.0, 1.5, 1.535, 1.0, wavelength_um=w)
             for w in (1.53, 1.57)]
    grid = MeshGenerator.generate(geoms[0], 0.5, cfg)
    dg = export_device_grid(grid, 256)
    base = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 4, cfg)
    monkeypatch.setenv("PL_FEM_ACC", "blk")
    blk = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 4, cfg)
    for ms, mu in zip(blk, base):
        assert len(ms) == len(mu) and len(ms) > 0
        for a, b in zip(ms, mu):
            # f16 slab quantization of differently-rounded bases bounds
            # reproducibility (see test_parallel), not the 2^-16 acc
            assert a["n_eff"] == pytest.approx(b["n_eff"], rel=2e-5)


def test_sweep_solve_blk_sharded(sweep_setup, monkeypatch):
    """PL_FEM_ACC=blk under the 8-device designs mesh: BlkTables
    replicate through the generic shard_map specs and parity holds."""
    from pl_fem_tpu.config import SolverConfig
    from pl_fem_tpu.parallel import design_mesh
    from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver

    cfg = SimulationConfig(
        mesh_min_points=400, mesh_target_points=1600,
        mesh=MeshConfig(bucket_rounding=256),
        solver=SolverConfig(backend="tpu", cheb_degree=120, cheb_passes=2,
                            beta_passes=1, bootstrap=False))
    geoms = [MCFGeometry(3, 8.0, 1.5, 1.535, 1.0, wavelength_um=w)
             for w in (1.53, 1.55, 1.57, 1.59)]
    grid = MeshGenerator.generate(geoms[0], 0.5, cfg)
    dg = export_device_grid(grid, 256)
    monkeypatch.setenv("PL_FEM_ACC", "blk")
    single = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 4, cfg)
    mesh = design_mesh(jax.devices()[:4])
    sharded = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 4, cfg,
                                                     mesh=mesh)
    for ms, mu in zip(sharded, single):
        assert len(ms) == len(mu) and len(ms) > 0
        for a, b in zip(ms, mu):
            assert a["n_eff"] == pytest.approx(b["n_eff"], rel=2e-5)


def test_layout_static_dispatch(sweep_setup):
    """_sweep_apply_A dispatches on its EXPLICIT layout argument (a
    static jit arg threaded from SolverConfig.apply_layout) — never on
    the environment, which the jit cache cannot key on."""
    qs, gs, mask, parks, betas, Xf = sweep_setup
    alpha = jnp.float32(1.0)
    y1 = kernels._sweep_apply_A(qs, gs, mask, parks, betas, alpha, Xf,
                                "flat")
    y0 = kernels._sweep_apply_A(qs, gs, mask, parks, betas, alpha, Xf)
    scale = float(jnp.abs(y0).max())
    assert float(jnp.abs(y0 - y1).max()) / scale < 2e-6
    with pytest.raises(ValueError, match="unknown apply layout"):
        kernels._sweep_apply_A(qs, gs, mask, parks, betas, alpha, Xf,
                               "bogus")


def test_kernel_knob_resolution(monkeypatch):
    """Config fields win over env vars; env fills None; bad values
    raise (the knobs bypass neither SolverConfig nor validation)."""
    from pl_fem_tpu.config import SolverConfig
    from pl_fem_tpu.solvers.vectorial import (_resolve_accumulate,
                                              _resolve_apply_layout)

    monkeypatch.delenv("PL_FEM_APPLY_LAYOUT", raising=False)
    monkeypatch.delenv("PL_FEM_ACC", raising=False)
    assert _resolve_apply_layout(SolverConfig()) == "packed"
    assert _resolve_accumulate(SolverConfig()) == "gather"
    assert _resolve_apply_layout(SolverConfig(apply_layout="flat")) \
        == "flat"
    assert _resolve_accumulate(SolverConfig(accumulate="blk")) == "blk"
    monkeypatch.setenv("PL_FEM_APPLY_LAYOUT", "flat")
    monkeypatch.setenv("PL_FEM_ACC", "blk")
    assert _resolve_apply_layout(SolverConfig()) == "flat"
    assert _resolve_accumulate(SolverConfig()) == "blk"
    # explicit config beats env
    assert _resolve_apply_layout(SolverConfig(apply_layout="packed")) \
        == "packed"
    assert _resolve_accumulate(SolverConfig(accumulate="gather")) \
        == "gather"
    monkeypatch.setenv("PL_FEM_APPLY_LAYOUT", "nope")
    with pytest.raises(ValueError, match="apply_layout"):
        _resolve_apply_layout(SolverConfig())
    with pytest.raises(ValueError, match="accumulate"):
        _resolve_accumulate(SolverConfig(accumulate="nope"))
