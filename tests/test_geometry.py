"""Golden-layout geometry tests (SURVEY.md §4 test plan, item a)."""
import numpy as np
import pytest

from pl_fem_tpu.models import (
    MCFGeometry,
    PhotonicLantern,
    PhotonicLanternGeometry,
    SUPPORTED_N_CORES,
    generate_core_positions,
    get_sampling_weights,
    build_geometry_from_sample,
)


def _pairdists(pos):
    n = len(pos)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    return np.sort(d[np.triu_indices(n, 1)])


def test_all_layouts_construct_and_validate():
    for n in SUPPORTED_N_CORES:
        g = MCFGeometry(n, 8.0, 1.2, 1.53, 1.0)
        assert g.positions.shape == (n, 2)
        ok, msg = g.validate()
        assert ok, f"N={n}: {msg}"


def test_pentagon_5_distances():
    pos, ctype, has_c, n_peri, r_ring = generate_core_positions(5, 8.0)
    assert ctype == "pentagonal_ring_5" and not has_c and n_peri == 5
    d = _pairdists(pos)
    # regular pentagon inscribed at R=pitch: side = 2 R sin(pi/5)
    side = 2 * 8.0 * np.sin(np.pi / 5)
    assert d[0] == pytest.approx(side, rel=1e-12)
    assert r_ring == pytest.approx(8.0)


def test_pentagon_center_6_center_distance():
    pos, ctype, has_c, *_ = generate_core_positions(6, 8.0, "pentagon_center")
    assert ctype == "pentagon_center_6" and has_c
    assert np.allclose(np.linalg.norm(pos[1:], axis=1), 8.0)


def test_hex7_nearest_neighbour_is_pitch():
    pos, ctype, has_c, n_peri, _ = generate_core_positions(7, 8.0)
    assert ctype == "hexagonal_1plus6_7" and has_c and n_peri == 6
    assert _pairdists(pos)[0] == pytest.approx(8.0)
    assert np.allclose(pos[0], 0.0)


def test_octagon_8_ring_spacing():
    pos, *_ = generate_core_positions(8, 8.0)
    ring = pos[1:]
    d_adj = np.linalg.norm(ring[1] - ring[0])
    # heptagon ring at R=pitch: adjacent spacing = 2 R sin(pi/7) ~ 0.868 pitch
    assert d_adj == pytest.approx(2 * 8.0 * np.sin(np.pi / 7), rel=1e-12)


def test_19_core_counts_and_rings():
    pos, ctype, has_c, n_peri, r_ring = generate_core_positions(19, 8.0)
    assert pos.shape == (19, 2) and has_c and n_peri == 18
    radii = np.sort(np.round(np.linalg.norm(pos, axis=1), 6))
    assert radii[0] == 0.0
    assert np.sum(np.isclose(radii, 8.0)) == 6
    assert np.sum(np.isclose(radii, 16.0)) == 6
    assert np.sum(np.isclose(radii, 8.0 * np.sqrt(3))) == 6
    assert r_ring == pytest.approx(16.0)


def test_sampling_weights_normalized():
    w = get_sampling_weights([2, 3, 7, 19])
    assert np.isclose(sum(w), 1.0)
    assert w[2] == max(w)  # 7-core dominates the literature prior


def test_epsilon_values():
    g = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    eps0 = g.epsilon(np.array([0.0]), np.array([0.0]))
    assert np.real(eps0[0]) == pytest.approx(1.53**2)
    eps_far = g.epsilon(np.array([100.0]), np.array([0.0]))
    assert np.real(eps_far[0]) <= 1.0 + 1e-12
    # PML adds positive imaginary part near the outer boundary
    r_pml = g.domain_radius - 0.1 * g.pml_thickness
    eps_pml = g.epsilon(np.array([r_pml]), np.array([0.0]))
    assert np.imag(eps_pml[0]) > 0


def test_attribute_contract():
    g = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    assert g.core_positions.shape == (7, 2)
    assert len(g.core_radii) == 7 and g.r_core == 1.2
    assert g.k0 > 0 and g.domain_radius > 0 and g.pml_thickness > 0
    assert isinstance(g.use_complex_pml, bool)
    assert len(g.hash) == 20 and g.V_number > 0
    assert g.taper_length is None


def test_taper_profiles_and_validation():
    pl = PhotonicLantern.build(n_cores=7, pitch_um=8.0, core_radius_um=1.2,
                               n_core=1.53, n_clad=1.0, taper_length_mm=0.375)
    ok, msg = pl.taper.validate()
    assert ok, msg
    t = pl.taper
    assert t.scale_at(0.0) == pytest.approx(0.0)
    assert t.scale_at(t.total_length_um) == pytest.approx(1.0)
    for prof in ("linear", "power", "sinusoidal", "exponential"):
        t.profile = prof
        s = [t.scale_at(z) for z in np.linspace(0, t.total_length_um, 7)]
        assert all(np.diff(s) >= -1e-12), prof


def test_get_tapered_scaling():
    g = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0, taper_length_um=375.0)
    gz = g.get_tapered(187.5)
    assert gz.r_core == pytest.approx(0.6)
    assert gz.pitch == pytest.approx(4.0)
    g0 = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    assert g0.get_tapered(100.0) is g0  # no taper configured


def test_photonic_lantern_geometry_facade():
    pos = np.array([[0.0, 0.0], [8.0, 0.0], [0.0, 8.0]])
    g = PhotonicLanternGeometry(3, "custom", pos, [1.2, 1.2, 1.2], 1.53)
    assert np.allclose(g.positions, pos)
    assert g.pitch == pytest.approx(8.0)
    assert g.arrangement == "custom"


def test_build_geometry_from_sample():
    d = build_geometry_from_sample(
        {"n_cores": 7, "pitch_um": 8.0, "core_radius_um": 1.2})
    assert d["config_type"] == "hexagonal_1plus6_7"
    assert d["pitch_min"] == pytest.approx(8.0)
    assert d["pitch_ratio"] == pytest.approx(8.0 / 2.4)
    assert 0 < d["packing_efficiency"] < 1


def test_geometry_hash_distinguishes():
    g1 = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    g2 = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    g3 = MCFGeometry(7, 8.1, 1.2, 1.53, 1.0)
    assert g1.hash == g2.hash
    assert g1.hash != g3.hash


def test_cauchy_materials():
    from pl_fem_tpu.materials import IPDipCauchy, Silica, Air
    # IP-Dip Cauchy at 1550nm: A + B/l^2 + C/l^4
    n = IPDipCauchy.n(1550.0)
    assert n == pytest.approx(1.5259 + 0.00860 / 1.55**2 + 0.000210 / 1.55**4)
    assert Silica.n(1550.0) == pytest.approx(1.4440, abs=1e-9)
    assert Air.n(1300.0) == 1.0
    # dispersion decreases with wavelength (normal dispersion)
    assert IPDipCauchy.n(1490.0) > IPDipCauchy.n(1650.0)
