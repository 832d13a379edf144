"""Loss-model tests.

Ports the reference's synthetic-vectorial-mode fixture (losses.py:
1233-1251) into assertions, plus clip-window and mux/demux-asymmetry
invariants of the facade.
"""
import numpy as np
import pytest

from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.physics import (
    EnhancedLossCalculator,
    LossCalculator,
    VectorialLossCalculator,
    build_design_params,
)


def synthetic_vector_modes(n=7, seed=42):
    rng = np.random.default_rng(seed)
    modes = []
    for k in range(n):
        Px = float(rng.uniform(0.3, 0.7))
        Py = 1.0 - Px
        modes.append({
            "n_eff": 1.20 - k * 0.003 + rng.normal(0, 1e-4),
            "beta": (2 * np.pi / 1.55) * (1.20 - k * 0.003),
            "P_x": Px, "P_y": Py,
            "PDL_dB": float(10 * np.log10(max(Px, Py) / min(Px, Py))),
            "polarization": "Hybrid",
            "confinement": float(rng.uniform(0.55, 0.72)),
            "core_overlap": 0.60,
            "div_ratio": 0.02,
            "is_vectorial": True,
            "method": "synthetic",
        })
    return modes


def synthetic_scalar_modes(n=6, n_dofs=50, seed=3):
    rng = np.random.default_rng(seed)
    modes = []
    for k in range(n):
        v = rng.normal(size=n_dofs)
        v /= np.linalg.norm(v)
        modes.append({
            "n_eff": 1.25 - 0.004 * k,
            "beta": (2 * np.pi / 1.55) * (1.25 - 0.004 * k),
            "field_vector": v,
            "confinement": float(rng.uniform(0.6, 0.9)),
            "core_overlap": 0.7,
            "PDL_dB": 0.0,
            "polarization": "scalar",
            "is_vectorial": False,
        })
    return modes


@pytest.fixture(scope="module")
def geom():
    return MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)


def test_crosstalk_vectorial_fixture(geom):
    """Reference self-test: XT strictly below -15 dB (no saturation)."""
    modes = synthetic_vector_modes()
    xt = EnhancedLossCalculator._calculate_crosstalk(modes)
    assert -40.0 <= xt <= -15.0
    # well-separated modes -> lower XT than nearly-degenerate ones
    degenerate = synthetic_vector_modes()
    for m in degenerate:
        m["n_eff"] = 1.20
    xt_deg = EnhancedLossCalculator._calculate_crosstalk(degenerate)
    assert xt <= xt_deg


def test_pdl_vectorial_from_powers():
    modes = synthetic_vector_modes()
    pdl = EnhancedLossCalculator._calculate_pdl_vectorial(modes)
    Px = sum(m["P_x"] for m in modes)
    Py = sum(m["P_y"] for m in modes)
    expect = 10 * np.log10(max(Px, Py) / min(Px, Py))
    assert pdl == pytest.approx(expect, abs=1e-9)


def test_vectorial_losses_clips_and_totals(geom):
    modes = synthetic_vector_modes()
    dp = build_design_params(modes, geom, 1550.0)
    out = VectorialLossCalculator.calculate_vectorial_losses(
        modes, geom, dp, "mux", 1550.0)
    assert out["success"]
    assert out["IL_total"] == pytest.approx(
        out["IL_polymer"] + out["IL_taper"] + out["IL_MMF"], abs=1e-9)
    assert out["MDL_total"] == pytest.approx(np.sqrt(
        out["MDL_polymer"]**2 + out["MDL_taper"]**2 + out["MDL_MMF"]**2),
        abs=1e-9)
    assert 0.05 <= out["PDL_total"] <= 10.0
    assert out["IL_MMF"] == pytest.approx(0.32)


def test_facade_mux_demux_asymmetry(geom):
    modes = synthetic_vector_modes()
    mux = LossCalculator.calculate_physical_losses(modes, geom, "mux", 1550.0)
    demux = LossCalculator.calculate_physical_losses(modes, geom, "demux",
                                                     1550.0)
    assert mux["success"] and demux["success"]
    assert mux["is_vectorial"] and demux["is_vectorial"]
    ratio = demux["PDL_dB"] / mux["PDL_dB"]
    # asymmetry factor clipped to [1.02, 1.12] (losses.py:799-803)
    assert 1.02 - 1e-9 <= ratio <= 1.12 + 1e-9
    assert mux["IL_dB"] == pytest.approx(demux["IL_dB"])
    assert -40 <= mux["crosstalk_dB"] <= -15


def test_facade_scalar_route(geom):
    modes = synthetic_scalar_modes()
    out = LossCalculator.calculate_physical_losses(modes, geom, "mux", 1550.0)
    assert out["success"] and not out["is_vectorial"]
    assert 0.0 <= out["IL_dB"] <= 40.0
    assert -70.0 <= out["crosstalk_dB"] <= -15.0
    demux = LossCalculator.calculate_physical_losses(modes, geom, "demux",
                                                     1550.0)
    assert demux["PDL_dB"] == pytest.approx(
        min(out["PDL_dB"] * 1.02, 10.0), rel=1e-6)


def test_crosstalk_scalar_reference_semantics():
    """Reference behavior (losses.py:622-663): tiny overlaps give a large
    positive log that the [-70, -15] clip pins at -15; the degeneracy
    penalty (min n_eff gap < 1e-4) is what pushes XT toward -70."""
    modes = synthetic_scalar_modes(n=4, n_dofs=40)
    Q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(40, 4)))
    for i, m in enumerate(modes):
        m["field_vector"] = Q[:, i]
        m["n_eff"] = 1.3 - 0.01 * i   # far from degeneracy
    xt = EnhancedLossCalculator._calculate_crosstalk_scalar(modes)
    assert xt == pytest.approx(-15.0, abs=1e-6)

    # overlapping fields + near-degenerate n_eff -> penalty drives XT down
    shared = np.random.default_rng(1).normal(size=40)
    for i, m in enumerate(modes):
        v = Q[:, i] + 0.9 * shared / np.linalg.norm(shared)
        m["field_vector"] = v / np.linalg.norm(v)
        m["n_eff"] = 1.3 - 1e-6 * i
    xt_deg = EnhancedLossCalculator._calculate_crosstalk_scalar(modes)
    assert xt_deg < -20.0


def test_pdl_realistic_degenerate_modes_finite(geom):
    """Regression: near-degenerate n_eff (real supermode spectra) must
    give a finite PDL (masked-gap sum once produced inf*0 = nan)."""
    modes = synthetic_scalar_modes(n=5)
    for i, m in enumerate(modes):
        m["n_eff"] = 1.478 + 1e-6 * i
    pdl = EnhancedLossCalculator._calculate_pdl_realistic(modes, geom, 1550.0)
    assert np.isfinite(pdl)
    assert 0.05 <= pdl <= 6.0


def test_empty_modes_fail_gracefully(geom):
    out = LossCalculator.calculate_physical_losses([], geom, "mux", 1550.0)
    assert out["success"] is False


def test_design_params_reconstruction(geom):
    modes = synthetic_vector_modes()
    dp = build_design_params(modes, geom, 1550.0)
    assert dp.N_cores == 7
    assert dp.has_central_core
    assert dp.config_type == "hexagonal"
    assert dp.pitch == pytest.approx(8.0)
    assert dp.L_taper > 0 and dp.L_mux > 0
    assert 0.01 <= dp.packing_efficiency <= 0.90
