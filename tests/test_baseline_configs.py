"""Scaled-down integration tests for the BASELINE.md benchmark configs.

Config 1 (7-core hex) is covered by tests/test_solvers.py and bench.py;
here: config 3 (19-core + PML + adaptive mesh), config 2 (multi-band
Cauchy sweep), config 4 (taper + CMT + losses end to end).
"""
import numpy as np
import pytest

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.materials import IPDipCauchy
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver


def test_19core_pml_vectorial():
    """BASELINE config 3 at CPU-test scale: 19-core, PML, adaptive mesh."""
    geom = MCFGeometry(19, 6.0, 1.0, 1.535, 1.0, wavelength_um=1.55,
                       use_complex_pml=True)
    ok, msg = geom.validate()
    assert ok, msg
    assert geom.config_type.startswith("hex")
    cfg = SimulationConfig(mesh_min_points=700, mesh_target_points=3000,
                           mesh=MeshConfig(bucket_rounding=256),
                           solver=SolverConfig(backend="tpu",
                                               cheb_degree=100,
                                               cheb_passes=2,
                                               beta_passes=1))
    grid = MeshGenerator.generate(geom, 0.25, cfg)
    dg = export_device_grid(grid, 256)
    modes = TrueVectorialMaxwellSolver(geom, config=cfg) \
        .solve_vectorial_modes(dg, n_modes_target=8)
    assert len(modes) >= 8
    ne = np.array([m["n_eff"] for m in modes])
    assert np.all((ne > geom.n_clad) & (ne < geom.n_core * 1.01))
    # 19-core supermode band: leading group clustered near the top
    assert ne[0] - ne[7] < 0.05
    assert modes[0]["confinement"] > 0.5


def test_multiband_cauchy_sweep():
    """BASELINE config 2: S/C/L/U band sweep with IP-Dip dispersion."""
    wls = [1.49, 1.57, 1.65]
    geoms = [MCFGeometry(3, 8.0, 1.3, float(IPDipCauchy.n_um(w)) + 0.01,
                         1.0, wavelength_um=w) for w in wls]
    cfg = SimulationConfig(mesh_min_points=700, mesh_target_points=2500,
                           mesh=MeshConfig(bucket_rounding=256),
                           solver=SolverConfig(backend="tpu",
                                               cheb_degree=120,
                                               cheb_passes=2,
                                               beta_passes=1))
    MeshGenerator.clear_cache()
    grid = MeshGenerator.generate(geoms[0], 0.35, cfg)
    dg = export_device_grid(grid, 256)
    sweep = TrueVectorialMaxwellSolver.solve_sweep(geoms, dg, 6, cfg)
    assert all(len(m) >= 3 for m in sweep)
    # dispersion: n_eff falls with wavelength (weaker guidance + Cauchy)
    fundamentals = [m[0]["n_eff"] for m in sweep]
    assert fundamentals[0] > fundamentals[1] > fundamentals[2]
    # Cauchy fit residual claim (README.md:275-279): spot values
    assert IPDipCauchy.n(1550.0) == pytest.approx(1.5259 + 0.0086 / 1.55**2
                                                  + 0.00021 / 1.55**4,
                                                  abs=1e-9)


def test_full_taper_cmt_pipeline(tmp_path):
    """BASELINE config 4: solve -> mux/demux losses -> CMT over taper."""
    from pl_fem_tpu.dataset import DatasetGenerator, ParametricSpace

    cfg = SimulationConfig(
        mesh_min_points=500, mesh_target_points=2000,
        mesh=MeshConfig(bucket_rounding=256, refinement=0.35),
        solver=SolverConfig(backend="tpu", cheb_degree=100, cheb_passes=2))
    gen = DatasetGenerator(space=ParametricSpace(n_cores_options=[2]),
                           config=cfg, use_vectorial=False,
                           n_taper_slices=3, base_seed=4, out_dir=tmp_path)
    sample = {"sample_id": "CMT_T1", "n_cores": 2, "core_radius_um": 1.3,
              "pitch_um": 9.0, "delta_n_percent": 1.8,
              "taper_length_mm": 0.375, "wavelength_nm": 1550,
              "taper_profile": "exponential", "arrangement": "default"}
    rec = gen.simulate_sample(sample)
    assert rec.success, rec.error_msg
    assert rec.IL_phys_mux_dB is not None
    assert rec.IL_phys_demux_dB is not None
    if rec.IL_CMT_mux_dB is not None:
        # lossless hermitian CMT conserves power
        assert rec.power_conservation_mux == pytest.approx(1.0, abs=0.05)
        assert rec.adiabatic_score is not None
    else:
        # CMT may be skipped when taper slices lose modes; recorded why
        assert rec.warnings
