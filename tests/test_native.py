"""Native C++ pattern builder vs the numpy implementation."""
import numpy as np
import pytest

from pl_fem_tpu import native
from pl_fem_tpu.ops import host_assembly as ha


@pytest.fixture(scope="module")
def coo():
    rng = np.random.default_rng(0)
    n = 500
    rows = rng.integers(0, n, 20000)
    cols = rng.integers(0, n, 20000)
    return rows, cols, n


def _numpy_pattern(rows, cols, n):
    order = np.lexsort((cols, rows))
    r_s, c_s = rows[order], cols[order]
    new = np.ones(len(r_s), dtype=bool)
    new[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
    slot = np.cumsum(new) - 1
    perm = np.empty(len(rows), dtype=np.int64)
    perm[order] = slot
    indices = c_s[new]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, r_s[new] + 1, 1)
    return perm, indices, np.cumsum(indptr)


def test_native_builds_and_matches(coo):
    rows, cols, n = coo
    out = native.build_pattern_native(rows, cols, n)
    if out is None:
        pytest.skip("native toolchain unavailable")
    perm, indices, indptr = out
    p_ref, i_ref, ip_ref = _numpy_pattern(rows, cols, n)
    np.testing.assert_array_equal(perm, p_ref)
    np.testing.assert_array_equal(indices, i_ref)
    np.testing.assert_array_equal(indptr, ip_ref)


def test_scatter_slots_matches_bincount(coo):
    rows, cols, n = coo
    out = native.build_pattern_native(rows, cols, n)
    if out is None:
        pytest.skip("native toolchain unavailable")
    perm, indices, indptr = out
    rng = np.random.default_rng(1)
    vals = rng.normal(size=len(rows))
    data = native.scatter_slots_native(perm, vals, len(indices))
    ref = np.bincount(perm, weights=vals, minlength=len(indices))
    np.testing.assert_allclose(data, ref, rtol=1e-12)


def test_host_assembly_uses_native_transparently():
    """build_pattern gives a working SharedCSR regardless of backend."""
    import scipy.sparse as sp

    rng = np.random.default_rng(2)
    n = 60
    rows = rng.integers(0, n, 500)
    cols = rng.integers(0, n, 500)
    vals = rng.normal(size=500)
    pat = ha.build_pattern(rows, cols, n)
    A = pat.with_blocks(vals)
    A_ref = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    np.testing.assert_allclose(A.toarray(), A_ref.toarray(), atol=1e-12)
