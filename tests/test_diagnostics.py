"""Diagnostic-mode and provenance tests (round 4).

Covers the VERDICT r3 A2 gap: with ``SolverConfig.debug_checks`` a
NaN/diverged design surfaces as a DIAGNOSED skip-and-record (not a
garbage beta) while healthy sweep members keep solving; mesh-quality
gates are wired into MeshGenerator (reference seam mesh.py:527-569);
DatasetRecord carries solver_mode/accuracy_class provenance
(docs/PARITY_r3.md §A: bucket-floor records must be distinguishable).
"""
import math

import numpy as np
import pytest

from pl_fem_tpu.config import MeshConfig, SimulationConfig, SolverConfig
from pl_fem_tpu.dataset import DatasetGenerator
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.solvers import TrueVectorialMaxwellSolver


def _cfg(**solver_kw):
    kw = dict(backend="tpu", cheb_degree=150, cheb_passes=2,
              beta_passes=2, bootstrap=False)
    kw.update(solver_kw)
    return SimulationConfig(
        mesh_min_points=500, mesh_target_points=2000,
        mesh=MeshConfig(bucket_rounding=256, refinement=0.45),
        solver=SolverConfig(**kw))


def test_solve_sweep_diagnoses_nan_design():
    """A NaN-epsilon design in a packed sweep is diagnosed and excluded;
    the healthy member of the same sweep still solves."""
    cfg = _cfg(debug_checks=True, beta_passes=1)
    good = MCFGeometry(3, 8.0, 1.5, 1.535, 1.44, wavelength_um=1.55)
    bad = MCFGeometry(3, 8.0, 1.5, float("nan"), 1.44, wavelength_um=1.55)
    grid = MeshGenerator.generate(good, 0.45, cfg)
    dg = export_device_grid(grid, 256)

    out = TrueVectorialMaxwellSolver.solve_sweep([good, bad], dg, 6, cfg)
    diags = TrueVectorialMaxwellSolver.last_sweep_diagnostics
    assert list(diags) == [1]
    assert "non-finite" in diags[1]
    assert out[1] == []
    assert len(out[0]) >= 1
    assert all(np.isfinite(m["n_eff"]) for m in out[0])


def test_solve_sweep_clean_run_has_no_diagnostics():
    cfg = _cfg(debug_checks=True, beta_passes=1)
    g = MCFGeometry(3, 8.0, 1.5, 1.535, 1.44, wavelength_um=1.55)
    grid = MeshGenerator.generate(g, 0.45, cfg)
    dg = export_device_grid(grid, 256)
    out = TrueVectorialMaxwellSolver.solve_sweep([g], dg, 6, cfg)
    assert TrueVectorialMaxwellSolver.last_sweep_diagnostics == {}
    assert len(out[0]) >= 1


def test_validator_rejects_nan_sample():
    """The physics gate skip-and-records a NaN sample cleanly (no
    int(NaN) crash): first line of defense before the solver."""
    from pl_fem_tpu.dataset.parametric_space import PhysicalValidator

    ok, msg, _ = PhysicalValidator().validate_sample_physics(
        dict(n_cores=3, core_radius_um=1.5, pitch_um=8.0,
             delta_n_percent=float("nan"), wavelength_nm=1550.0,
             n_clad=1.44))
    assert not ok and "non-finite" in msg


def test_bucketed_generator_skip_and_records_nan_design(monkeypatch):
    """End-to-end VERDICT r3 item 8: a NaN design that slips past the
    sampling gates (simulating NaN born mid-pipeline) is diagnosed by
    the solver into a failed record while its bucket-mates succeed."""
    from pl_fem_tpu.dataset.parametric_space import PhysicalValidator

    cfg = _cfg(debug_checks=True)
    gen = DatasetGenerator(config=cfg, use_vectorial=True)
    # let the NaN through the cheap validation gate so it reaches the
    # packed sweep: bucket_key uses n_clad + pitch/radius ratio only,
    # so both land in one bucket and the solver must diagnose lane 1
    real = PhysicalValidator.validate_sample_physics

    def passthrough(self, sample):
        ok, msg, m = real(self, sample)
        if not ok and "non-finite" in msg:
            return True, "OK", dict(m, V_number=4.0, n_modes_est=4)
        return ok, msg, m

    monkeypatch.setattr(PhysicalValidator, "validate_sample_physics",
                        passthrough)
    samples = [
        dict(sample_id="OK1", n_cores=3, core_radius_um=1.5, pitch_um=8.0,
             delta_n_percent=2.5, wavelength_nm=1550.0, n_clad=1.44),
        dict(sample_id="NAN", n_cores=3, core_radius_um=1.5, pitch_um=8.0,
             delta_n_percent=float("nan"), wavelength_nm=1550.0,
             n_clad=1.44),
    ]
    recs = gen.simulate_bucketed(samples)
    by_id = {r.sample_id: r for r in recs}
    ok, nan = by_id["OK1"], by_id["NAN"]
    assert not nan.success
    assert "diagnostic" in (nan.error_msg or "") \
        or "non-finite" in (nan.error_msg or ""), nan.error_msg
    assert ok.success, ok.error_msg
    assert math.isfinite(ok.n_eff_max) and ok.n_eff_max > 0


def test_mesh_quality_gate_warn_and_strict(monkeypatch):
    """Gate plumbing: 'warn' records the verdict on the grid, 'strict'
    refuses the mesh (the analyzer itself is tested in test_femgrid)."""
    from pl_fem_tpu.ops import femgrid as fg
    from pl_fem_tpu.ops.mesh_quality import MeshQualityAnalyzer

    geom = MCFGeometry(1, 8.0, 1.3, 1.46, 1.44, wavelength_um=1.55)
    cfg = SimulationConfig(mesh_min_points=200, mesh_target_points=800,
                           mesh=MeshConfig(quality_gate="warn"))
    grid = MeshGenerator.generate(geom, 0.3, cfg)
    assert grid.quality is not None
    assert grid.quality_ok            # tiny clean mesh passes
    assert "acceptable" in grid.quality_msg

    monkeypatch.setattr(MeshQualityAnalyzer, "validate_mesh_quality",
                        staticmethod(lambda mesh, strict=False:
                                     (False, "forced failure")))
    cfg_warn = SimulationConfig(
        mesh_min_points=200, mesh_target_points=800,
        enable_mesh_cache=False,
        mesh=MeshConfig(quality_gate="warn"))
    g2 = MeshGenerator.generate(geom, 0.3, cfg_warn)
    assert not g2.quality_ok and g2.quality_msg == "forced failure"

    cfg_strict = SimulationConfig(
        mesh_min_points=200, mesh_target_points=800,
        enable_mesh_cache=False,
        mesh=MeshConfig(quality_gate="strict"))
    with pytest.raises(RuntimeError, match="quality gate"):
        MeshGenerator.generate(geom, 0.3, cfg_strict)
    assert fg is not None


@pytest.mark.slow
def test_record_provenance_fields():
    """solver_mode/accuracy_class/mesh quality land on every record,
    and bucketed records are distinguishable from per-design ones."""
    cfg = _cfg(beta_passes=1)
    gen = DatasetGenerator(config=cfg, use_vectorial=True)
    sample = dict(sample_id="P1", n_cores=3, core_radius_um=1.5,
                  pitch_um=8.0, delta_n_percent=2.5, wavelength_nm=1550.0,
                  n_clad=1.44)
    rec = gen.simulate_sample(sample)
    assert rec.success, rec.error_msg
    assert rec.solver_mode == "per_design"
    assert rec.accuracy_class.startswith("fast")
    assert rec.mesh_quality_ok

    recs = gen.simulate_bucketed([dict(sample, sample_id="P2")])
    assert recs[0].success, recs[0].error_msg
    assert recs[0].solver_mode == "bucketed_sweep"

    cfg_acc = _cfg(beta_passes=2)
    gen_acc = DatasetGenerator(config=cfg_acc, use_vectorial=True)
    rec3 = gen_acc.simulate_sample(dict(sample, sample_id="P3"))
    assert rec3.accuracy_class.startswith("accuracy")

    # provenance survives the dict/CSV round-trip
    d = rec.to_dict()
    assert d["solver_mode"] == "per_design"
    assert "accuracy_class" in d
