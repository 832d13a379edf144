"""h-refinement convergence and robustness edge cases."""
import numpy as np
import pytest

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.analytic import lp_modes
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import ScalarHelmholtzSolver, TrueVectorialMaxwellSolver


def test_scalar_h_convergence():
    """LP01 error decreases under mesh refinement (accuracy is mesh-
    limited, not solver-limited)."""
    geom = MCFGeometry(1, 8.0, 1.5, 1.53, 1.0, wavelength_um=1.55,
                       use_complex_pml=False)
    exact = lp_modes(geom.V_number, geom.n_core, geom.n_clad)[0][2]
    errs = []
    for refinement, min_pts in ((0.35, 400), (0.7, 1600)):
        cfg = SimulationConfig(mesh_min_points=min_pts,
                               mesh_target_points=4 * min_pts,
                               mesh=MeshConfig(bucket_rounding=256),
                               solver=SolverConfig(backend="hybrid"))
        MeshGenerator.clear_cache()
        grid = MeshGenerator.generate(geom, refinement, cfg)
        dg = export_device_grid(grid, 256)
        modes = ScalarHelmholtzSolver(geom, cfg).solve(dg, 3)
        errs.append(abs(modes[0]["n_eff"] - exact))
    # halving h should shrink the error substantially (>= ~3x here)
    assert errs[1] < errs[0] / 3.0, errs


def test_solver_handles_oversized_mode_request():
    """n_modes_target larger than the guided set returns what exists."""
    geom = MCFGeometry(1, 8.0, 1.1, 1.46, 1.44, wavelength_um=1.55,
                       use_complex_pml=False)   # V ~ 1.07: single mode
    cfg = SimulationConfig(mesh_min_points=400, mesh_target_points=1600,
                           mesh=MeshConfig(bucket_rounding=256),
                           solver=SolverConfig(backend="hybrid"))
    MeshGenerator.clear_cache()
    grid = MeshGenerator.generate(geom, 0.35, cfg)
    dg = export_device_grid(grid, 256)
    modes = ScalarHelmholtzSolver(geom, cfg).solve(dg, n_modes_target=25)
    assert 1 <= len(modes) <= 6
    assert modes[0]["n_eff"] > geom.n_clad


def test_sweep_single_design_degenerate_batch():
    """solve_sweep with B=1 behaves like the per-design solver."""
    geom = MCFGeometry(2, 9.0, 1.2, 1.53, 1.0, wavelength_um=1.55)
    cfg = SimulationConfig(mesh_min_points=300, mesh_target_points=1200,
                           mesh=MeshConfig(bucket_rounding=128),
                           solver=SolverConfig(backend="tpu", cheb_degree=80,
                                               cheb_passes=2, beta_passes=1))
    MeshGenerator.clear_cache()
    grid = MeshGenerator.generate(geom, 0.3, cfg)
    dg = export_device_grid(grid, 128)
    sweep = TrueVectorialMaxwellSolver.solve_sweep([geom], dg, 4, cfg)
    assert len(sweep) == 1 and len(sweep[0]) >= 2
    single = TrueVectorialMaxwellSolver(geom, config=cfg) \
        .solve_vectorial_modes(dg, 4)
    assert sweep[0][0]["n_eff"] == pytest.approx(single[0]["n_eff"],
                                                 abs=5e-4)
