"""Jitted eigensolver kernels (compiled once per mesh bucket).

Every function here is a top-level ``jax.jit`` with all numeric state
passed as arguments (element blocks, DOF maps, masks, subspace) and only
shape-defining integers static. One XLA executable per (bucket, k,
degree) is compiled and then reused across filter passes, beta updates,
wavelengths and designs — the compile-once/run-many contract that makes
the Chebyshev eigensolver cheap on TPU.

Operator representation ("stacked" form): a C-component FEM operator is
one (E, 6C, 6C) per-element tensor applied as gather -> batched GEMM ->
segment-sum over the stacked DOF vector (C*D, k); C=1 covers the scalar
pencil, C=3 the fixed-beta vectorial operator (ops/assembly.py
``combine_vector3`` + ``stack_blocks``). B is always a plain or
(1/eps-weighted) mass matrix applied per component from its 6x6 blocks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# primitive applies (inlined by the jitted kernels)
# ---------------------------------------------------------------------------
#
# Operator apply = gather -> batched GEMM -> gather-sum. The accumulation
# back to DOFs uses the bounded-valence transpose table (femgrid
# ``_dof_gather_table``) instead of segment_sum: TPU scatters serialize,
# fixed-width gathers vectorize.

from typing import NamedTuple


class GatherScatter(NamedTuple):
    """Grid topology for the matrix-free applies."""

    elem_dofs: jax.Array     # (E, 6) int32
    idx: jax.Array           # (D, V) int32 flat entries e*6+l
    valid: jax.Array         # (D, V) bool


def _accumulate(Ye, gs: GatherScatter, C: int):
    """(E, 6C, k) element results -> (C*D, k) DOF sums via gather."""
    E, sixC, k = Ye.shape
    flat = Ye.reshape(E * sixC, k)
    e = gs.idx // 6
    l = gs.idx - 6 * e
    parts = []
    for c in range(C):
        idxc = e * sixC + c * 6 + l                  # (D, V)
        g = flat[idxc]                               # (D, V, k)
        parts.append(jnp.where(gs.valid[..., None], g, 0.0).sum(axis=1))
    return jnp.concatenate(parts, axis=0)


def _apply_stacked(Abig, gs: GatherScatter, mask, park, X, C: int):
    """P A P X + park (I-P) X for the stacked (E,6C,6C) operator."""
    D = mask.shape[0]
    ed = jnp.concatenate([gs.elem_dofs + c * D for c in range(C)], axis=1)
    maskC = jnp.tile(mask, C)[:, None].astype(X.dtype)
    Xm = X * maskC
    G = Xm[ed]
    # HIGHEST: true-f32 MXU passes — the Chebyshev recurrence needs f32
    # accuracy; the TPU default (bf16 passes) stalls convergence at ~1e-2.
    Ye = jnp.einsum("eij,ejk->eik", Abig.astype(X.dtype), G,
                    preferred_element_type=X.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    Y = _accumulate(Ye, gs, C)
    return Y * maskC + park * (X - Xm)


def _apply_mass(Bblk, gs: GatherScatter, mask, X, C: int, park: float = 1.0):
    """Block-diagonal mass apply (same 6x6 blocks per component)."""
    D = mask.shape[0]
    B = Bblk.astype(X.dtype)
    m = mask[:, None].astype(X.dtype)
    parts = []
    for c in range(C):
        Xc = X[c * D:(c + 1) * D]
        Xm = Xc * m
        Ye = jnp.einsum("eij,ejk->eik", B, Xm[gs.elem_dofs],
                        preferred_element_type=X.dtype,
                        precision=jax.lax.Precision.HIGHEST)
        Yc = _accumulate(Ye, gs, 1)
        parts.append(Yc * m + park * (Xc - Xm))
    return jnp.concatenate(parts, axis=0)


def _apply_binv(Bblk, gs: GatherScatter, mask, dinv_sqrt, lo, hi, X, C: int,
                degree: int):
    """Chebyshev semi-iteration for B^{-1} on the Jacobi-scaled mass."""
    ds = jnp.tile(dinv_sqrt, C)[:, None].astype(X.dtype)

    def scaled(V):
        return ds * _apply_mass(Bblk, gs, mask, ds * V, C)

    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    sigma1 = theta / delta

    Yh = ds * X
    Z = jnp.zeros_like(Yh)
    R = Yh
    Dd = R / theta
    rho = 1.0 / sigma1

    def body(_, carry):
        Z, R, Dd, rho = carry
        Z = Z + Dd
        R = R - scaled(Dd)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        Dd = rho_new * rho * Dd + (2.0 * rho_new / delta) * R
        return Z, R, Dd, rho_new

    Z, R, Dd, rho = jax.lax.fori_loop(0, degree, body, (Z, R, Dd, rho))
    return ds * (Z + Dd)


# ---------------------------------------------------------------------------
# spectrum bounds (deterministic, per-element Rayleigh quotients)
# ---------------------------------------------------------------------------
#
# For affine P2 elements the local mass is EXACTLY |detJ| * B_ref with a
# constant 6x6 reference mass (Dunavant-4 integrates P2xP2 exactly), so
# every element-local mass quantity reduces to host-precomputed
# constants — no on-device factorizations anywhere.

def _reference_mass_constants():
    import numpy as _np

    from .quadrature import RULES, p2_shape

    qp, qw = RULES[4]
    N, _ = p2_shape(qp)
    B_ref = _np.einsum("q,qi,qj->ij", qw, N, N)
    d = _np.diag(B_ref)
    S = B_ref / _np.sqrt(_np.outer(d, d))
    wS = _np.linalg.eigvalsh(S)
    Linv = _np.linalg.inv(_np.linalg.cholesky(B_ref))
    return B_ref, float(wS[0]), float(wS[-1]), Linv


_B_REF, MASS_LO, MASS_HI, _LINV_REF = _reference_mass_constants()


@partial(jax.jit, static_argnames=("C",))
def pencil_bounds_elem(Abig, Bblk, elem_valid, C: int = 1):
    """Deterministic spectrum bounds from per-element quotients.

    The pencil (A, B) and the Jacobi-scaled mass decompose EXACTLY into
    per-element quadratic forms, so (classic element-eigenvalue bound)

        spec(D_B^{-1} B)  subset  [MASS_LO, MASS_HI]   (constants: the
            local mass is |detJ| B_ref for affine P2 elements)
        |spec(B^{-1} A)|  <=  max_e |L_ref^{-1} (A_e/|detJ|_e) L_ref^{-T}|

    with the last norm bounded by Gershgorin row sums of the constant-
    congruence-transformed blocks — batched (6C x 6C) matmuls plus
    reductions only, no factorizations, trivial compile on any backend.

    Returns (lo_B, hi_B, bound_A).
    """
    dtype = Abig.dtype
    # |detJ|_e recovered from the local mass trace (B_e = |detJ| B_ref)
    detj = (jnp.einsum("eii->e", Bblk)
            / jnp.asarray(np.trace(_B_REF), dtype=dtype))
    Linv3 = jnp.zeros((6 * C, 6 * C), dtype=dtype)
    Lref = jnp.asarray(_LINV_REF, dtype=dtype)
    for c in range(C):
        Linv3 = Linv3.at[6 * c:6 * c + 6, 6 * c:6 * c + 6].set(Lref)
    W = jnp.einsum("ij,ejk,lk->eil", Linv3,
                   Abig / jnp.maximum(detj, 1e-300)[:, None, None], Linv3,
                   precision=jax.lax.Precision.HIGHEST)
    rows = jnp.abs(W).sum(axis=2).max(axis=1)              # (E,) Gershgorin
    bound_A = jnp.max(jnp.where(elem_valid, rows, 0.0)) * 1.02
    return (jnp.asarray(MASS_LO, dtype=jnp.float32),
            jnp.asarray(MASS_HI, dtype=jnp.float32), bound_A)


# ---------------------------------------------------------------------------
# one filter -> Rayleigh-Ritz pass
# ---------------------------------------------------------------------------

def cheb_rr_pass_impl(Abig, Bblk, gs, mask, dinv_sqrt, lo, hi, park,
                      X, cut, bound, C: int = 1, degree: int = 300,
                      binv_degree: int = 8, renorm_every: int = 8):
    """Low-end Chebyshev filter + QR-stabilized Rayleigh-Ritz, one pass.

    Pure float32 throughout — the TPU fast path (f64 is emulated on TPU
    and poisons both compile time and throughput). Final eigenvalue
    accuracy comes from the host float64 polish (ops/host_assembly.py);
    this pass only has to steer the subspace, for which f32 with a QR
    basis (stable even when the filtered columns are nearly collinear)
    is sufficient.

    Args:
        Abig: (E, 6C, 6C) stacked operator blocks (any float dtype).
        Bblk: (E, 6, 6) mass blocks (per component).
        X: (C*D, k) float32 subspace from the previous pass (or random).
        cut/bound: wanted eigenvalues lie below ``cut``; unwanted within
            [cut, bound].

    Returns:
        theta (k,) ascending, X (C*D, k) B-orthonormal Ritz vectors
        (float32), resnorm (k,).
    """
    A32 = Abig.astype(jnp.float32)
    B32 = Bblk.astype(jnp.float32)
    c = (0.5 * (bound + cut)).astype(jnp.float32)
    h = (0.5 * (bound - cut)).astype(jnp.float32)

    def apply_t(V):
        W = _apply_stacked(A32, gs, mask, park, V, C)
        W = _apply_binv(B32, gs, mask, dinv_sqrt, lo, hi, W, C,
                        binv_degree)
        return (W - c * V) / h

    T0 = X.astype(jnp.float32)
    T1 = apply_t(T0)

    def body(i, carry):
        T0, T1 = carry
        T2 = 2.0 * apply_t(T1) - T0
        do = (i % renorm_every) == (renorm_every - 1)
        s = 1.0 / (jnp.linalg.norm(T2, axis=0, keepdims=True) + 1e-30)
        s = jnp.where(do, s, jnp.ones_like(s))
        return T1 * s, T2 * s

    _, Xf = jax.lax.fori_loop(1, degree, body, (T0, T1))

    # QR basis (stable for near-collinear filtered columns), then
    # Rayleigh-Ritz via a Cholesky congruence of the small (k, k) Gram.
    hp = jax.lax.Precision.HIGHEST
    Q, _ = jnp.linalg.qr(Xf)
    AQ = _apply_stacked(A32, gs, mask, park, Q, C)
    BQ = _apply_mass(B32, gs, mask, Q, C)
    H = jnp.matmul(Q.T, AQ, precision=hp)
    G = jnp.matmul(Q.T, BQ, precision=hp)
    H = 0.5 * (H + H.T)
    G = 0.5 * (G + G.T)
    k = H.shape[0]
    G = G + (1e-6 * jnp.trace(G) / k) * jnp.eye(k, dtype=G.dtype)
    L = jnp.linalg.cholesky(G)
    Hw = jax.scipy.linalg.solve_triangular(L, H, lower=True)
    Hw = jax.scipy.linalg.solve_triangular(L, Hw.T, lower=True)
    Hw = 0.5 * (Hw + Hw.T)
    theta, W = jnp.linalg.eigh(Hw)
    Y = jax.scipy.linalg.solve_triangular(L.T, W, lower=False)
    Xr = jnp.matmul(Q, Y, precision=hp)
    AXr = jnp.matmul(AQ, Y, precision=hp)
    BXr = jnp.matmul(BQ, Y, precision=hp)
    R = AXr - BXr * theta[None, :]
    res = jnp.linalg.norm(R, axis=0) / (jnp.linalg.norm(AXr, axis=0) + 1e-30)
    return theta, Xr, res


cheb_rr_pass = partial(jax.jit, static_argnames=(
    "C", "degree", "binv_degree", "renorm_every"))(cheb_rr_pass_impl)

# Design-batched variant: vmap over a leading axis of every per-design
# array (different meshes in the SAME bucket share shapes, so one
# executable serves the whole batch). This is the unit the shard_map
# dataset engine distributes over the device mesh.
_BATCH_AXES = (0, 0, 0, 0, 0, None, None, 0, 0, 0, 0)


@partial(jax.jit, static_argnames=("C", "degree", "binv_degree",
                                   "renorm_every"))
def cheb_rr_pass_batched(Abig, Bblk, gs, mask, dinv_sqrt, lo, hi,
                         park, X, cut, bound, C: int = 1, degree: int = 300,
                         binv_degree: int = 8, renorm_every: int = 8):
    fn = partial(cheb_rr_pass_impl, C=C, degree=degree,
                 binv_degree=binv_degree, renorm_every=renorm_every)
    return jax.vmap(fn, in_axes=_BATCH_AXES)(
        Abig, Bblk, gs, mask, dinv_sqrt, lo, hi, park, X, cut, bound)


def solve_lowest_kernel(Abig, Bblk, gs, mask, diag_B, X0, cut,
                        elem_valid, C: int = 1, degree: int = 300,
                        passes: int = 2, tol: float = 1e-7,
                        max_passes: int = 10, park: float = 1.0,
                        binv_degree: int = 8, seed: int = 0,
                        n_wanted: int = 0):
    """Driver: adaptive filter/RR passes until residuals below tol.

    Python-side loop over the jitted kernels above; everything inside is
    compiled once per bucket shape and reused.
    """

    lo, hi, bound = pencil_bounds_elem(Abig, Bblk, elem_valid, C=C)
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    dinv_sqrt = (1.0 / jnp.sqrt(jnp.maximum(diag_B, 1e-30))
                 ).astype(jnp.float32)
    bound = jnp.maximum(bound, park * 1.05)
    bound = jnp.maximum(bound, cut * 1.5 + 1.0)

    # f32 filtering floors around a few 1e-6 relative residual; the host
    # float64 polish (ops/host_assembly.py) recovers full accuracy from
    # a subspace at that level, so don't spin extra passes chasing less.
    # Stall detection: stop when the wanted residual no longer improves.
    eff_tol = max(tol, 5e-6)
    X = X0.astype(jnp.float32)
    theta = Xr = res = None
    prev = np.inf
    for ip in range(max_passes):
        theta, Xr, res = cheb_rr_pass(
            Abig, Bblk, gs, mask, dinv_sqrt, lo, hi,
            jnp.float32(park), X, jnp.float32(cut), bound.astype(jnp.float32),
            C=C, degree=degree, binv_degree=binv_degree)
        X = Xr
        if ip + 1 >= passes:
            th = np.asarray(theta)
            rs = np.asarray(res)
            wanted = th < cut
            if n_wanted > 0:
                # only the n_wanted lowest matter (theta is ascending)
                wanted = wanted & (np.arange(len(th)) < n_wanted)
            maxres = rs[wanted].max() if wanted.any() else rs.min()
            if maxres < eff_tol or maxres > 0.7 * prev:
                break
            prev = maxres
    return theta, Xr, res
