"""CMT propagation tests (SURVEY.md §4: unitarity, RK45-vs-expm
agreement, demux renormalization, adiabaticity criterion)."""
import numpy as np
import pytest

from pl_fem_tpu.physics.cmt import CoupledModeTheory


def make_modes_list(z, n_modes=4, beta0=6.0, spread=0.02, seed=0, n_dofs=30):
    """Synthetic local modes with slowly varying beta along z."""
    rng = np.random.default_rng(seed)
    fields = rng.normal(size=(n_dofs, n_modes))
    fields /= np.linalg.norm(fields, axis=0)
    out = []
    for zi in z:
        modes = []
        for m in range(n_modes):
            modes.append({
                "beta": beta0 - spread * m * (1 + 0.1 * zi / max(z[-1], 1)),
                "n_eff": (beta0 - spread * m) / 4.05,
                "field_vector": fields[:, m],
                "confinement": 0.8,
            })
        out.append(modes)
    return out


@pytest.fixture(scope="module")
def cmt():
    return CoupledModeTheory(omega=2 * np.pi * 3e8 / 1.55e-6)


def test_unitarity_lossless(cmt):
    """Hermitian H => expm(-iH dz) is unitary => power conserved ~1e-12."""
    z = np.linspace(0.0, 375.0, 40)
    modes_list = make_modes_list(z)
    A0 = np.zeros(4, dtype=complex)
    A0[0] = 1.0
    res = cmt.propagate_cmt(z, modes_list, A0, "mux")
    assert res["power_conservation"] == pytest.approx(1.0, abs=1e-9)
    assert abs(res["IL_dB"]) < 1e-8
    assert cmt.verify_power_conservation(res)
    assert len(res["segment_losses"]) == len(z) - 1


def test_piecewise_vs_adaptive(cmt):
    z = np.linspace(0.0, 100.0, 30)
    modes_list = make_modes_list(z)
    A0 = np.ones(4, dtype=complex) / 2.0
    r1 = cmt.propagate_cmt(z, modes_list, A0, "mux", use_adaptive=False)
    r2 = cmt.propagate_cmt(z, modes_list, A0, "mux", use_adaptive=True)
    # both unitary evolutions of similar H: amplitudes agree to ~1e-3
    assert np.allclose(np.abs(r1["amplitudes_final"]),
                       np.abs(r2["amplitudes_final"]), atol=5e-3)


def test_demux_renormalizes_input(cmt):
    z = np.linspace(0.0, 50.0, 10)
    modes_list = make_modes_list(z)
    A0 = np.array([3.0, 0, 0, 0], dtype=complex)
    res = cmt.propagate_cmt(z, modes_list, A0, "demux")
    # input renormalized to total power = n_modes (config.py:88-91)
    assert np.sum(np.abs(res["amplitudes_final"])**2) == pytest.approx(
        4.0, abs=1e-6)
    assert res["direction"] == "demux"


def test_coupling_matrix_structure(cmt):
    z = [0.0, 1.0]
    modes = make_modes_list(z)[0]
    H = cmt._compute_coupling_matrix(modes, modes)
    assert np.allclose(np.diag(H), [m["beta"] for m in modes])
    assert np.allclose(H, H.conj().T)
    offdiag = H - np.diag(np.diag(H))
    assert 0 < np.abs(offdiag).max() < 1e-2   # |overlap| * 1e-3 scale


def test_rigorous_fallback_without_matrix():
    cmt_r = CoupledModeTheory(omega=1.0, coupling_method="rigorous")
    modes = make_modes_list([0.0])[0]
    H = cmt_r._compute_coupling_matrix(modes, modes)  # no delta_eps_mass
    assert np.allclose(np.diag(H), [m["beta"] for m in modes])


def test_invalid_coupling_method():
    with pytest.raises(ValueError):
        CoupledModeTheory(omega=1.0, coupling_method="banana")


def test_rigorous_coupling_multicomponent():
    """Rigorous coupling accepts (C*D, M) stacked fields: the per-
    component mass applications must sum to the manual two-block
    computation (config.py:295-302 overlap on the full field)."""
    rng = np.random.default_rng(3)
    D, M = 20, 3
    W = rng.normal(size=(D, D))
    dem = W + W.T                       # symmetric weight matrix
    modes = []
    fields = rng.normal(size=(2 * D, M))
    for m in range(M):
        modes.append({"beta": 6.0 - 0.01 * m, "field_vector": fields[:, m]})
    cmt_r = CoupledModeTheory(omega=4.0, coupling_method="rigorous")
    H = cmt_r._compute_coupling_matrix(modes, modes, delta_eps_mass=dem)
    # manual: sum of per-component overlaps, omega/4, P-normalized
    P = np.einsum("dm,dm->m", fields, fields)
    C = (fields[:D].T @ dem @ fields[:D]
         + fields[D:].T @ dem @ fields[D:]) * (4.0 / 4.0)
    C = C / np.sqrt(np.outer(P, P))
    C -= np.diag(np.diag(C))
    expect = np.diag([m["beta"] for m in modes]) + C
    assert np.allclose(H, expect, atol=1e-12)
    assert np.allclose(H, H.conj().T)
    # a non-multiple field length is an error, not silent misuse
    bad = [{"beta": 6.0, "field_vector": np.ones(D + 1)},
           {"beta": 5.9, "field_vector": np.ones(D + 1)}]
    with pytest.raises(ValueError):
        cmt_r._compute_coupling_matrix(bad, bad, delta_eps_mass=dem)


def test_adiabaticity_criterion(cmt):
    z = np.linspace(0.0, 100.0, 11)
    # slowly varying: adiabatic
    slow = make_modes_list(z, spread=0.5)
    r = cmt.estimate_adiabaticity(z, slow)
    assert r["is_adiabatic"]
    # abrupt beta jump with tiny modal spacing: violations
    fast = make_modes_list(z, spread=1e-3)
    for i, modes in enumerate(fast):
        for m in modes:
            m["beta"] += 0.5 * i
    r2 = cmt.estimate_adiabaticity(z, fast)
    assert r2["n_violations"] > 0
    assert not r2["is_adiabatic"]
    assert r2["max_gradient"] > 0
