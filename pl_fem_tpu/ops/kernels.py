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
    """Grid topology for the matrix-free applies.

    The accumulate table is split by DOF class: the wide table covers
    rows [0, split) (mesh vertices, valence up to ~12), the width-2
    table rows [split, D) (P2 edge midpoints, valence exactly <= 2) —
    ~3.5x fewer gathered rows than one max-width table.
    """

    elem_dofs: jax.Array     # (E, 6) int32
    idx_v: jax.Array         # (split, Wv) int32 flat entries e*6+l
    valid_v: jax.Array       # (split, Wv) bool
    idx_e: jax.Array         # (D - split, 2) int32
    valid_e: jax.Array       # (D - split, 2) bool


def _accumulate(Ye, gs: GatherScatter, C: int):
    """(E, 6C, k) element results -> (C*D, k) DOF sums via gathers."""
    E, sixC, k = Ye.shape
    flat = Ye.reshape(E * sixC, k)

    def gather_sum(idx, valid):
        e = idx // 6
        l = idx - 6 * e
        out = []
        for c in range(C):
            idxc = e * sixC + c * 6 + l              # (rows, W)
            g = flat[idxc]                           # (rows, W, k)
            out.append(jnp.where(valid[..., None], g, 0.0).sum(axis=1))
        return out

    pv = gather_sum(gs.idx_v, gs.valid_v)
    pe = gather_sum(gs.idx_e, gs.valid_e)
    return jnp.concatenate(
        [jnp.concatenate([pv[c], pe[c]], axis=0) for c in range(C)], axis=0)


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
# quadrature-factor matrix-free applies (bandwidth-optimal hot path)
# ---------------------------------------------------------------------------
#
# The blocks form streams (E, 18, 18) = 324 floats/element from HBM on
# EVERY Chebyshev step — measured bandwidth-bound on TPU. The quadrature
# factorization stores only 16 floats/element (invJT 4, |detJ|-scaled
# weights Q, 1/eps Q) and reconstructs the operator action through
# SHARED reference tensors (N (Q,6), dN (Q,6,2)) — ~20x less element
# traffic per step at a modest flop increase.


def _reference_tensors():
    from .quadrature import RULES, p2_shape

    qp, qw = RULES[4]
    N, dN = p2_shape(qp)
    return (jnp.asarray(N, jnp.float32), jnp.asarray(dN, jnp.float32),
            jnp.asarray(qw, jnp.float32))


_N_REF, _DN_REF, _QW_REF = _reference_tensors()


class QFactor(NamedTuple):
    """Per-element quadrature factors of the vectorial operator family."""

    invJT: jax.Array       # (E, 2, 2) float32 J^{-T}
    w: jax.Array           # (E, Q) |detJ|-scaled quadrature weights
    inv_eps: jax.Array     # (E, Q) 1/Re(eps) at quadrature points


def _qp_eval(U, qf: QFactor):
    """Nodal (E, C, 6, k) -> values (E, C, Q, k) and physical gradients
    (E, C, Q, 2, k)."""
    hp = jax.lax.Precision.HIGHEST
    V = jnp.einsum("qi,ecik->ecqk", _N_REF, U, precision=hp)
    R = jnp.einsum("qid,ecik->ecqdk", _DN_REF, U, precision=hp)
    G = jnp.einsum("ead,ecqdk->ecqak", qf.invJT, R, precision=hp)
    return V, G


def _qp_adjoint(S, T, qf: QFactor):
    """Adjoint of _qp_eval: value-channel S (E, C, Q, k) and gradient-
    channel T (E, C, Q, 2, k) -> nodal (E, C, 6, k)."""
    hp = jax.lax.Precision.HIGHEST
    Y = jnp.einsum("qi,ecqk->ecik", _N_REF, S, precision=hp)
    Rt = jnp.einsum("ead,ecqak->ecqdk", qf.invJT, T, precision=hp)
    Y = Y + jnp.einsum("qid,ecqdk->ecik", _DN_REF, Rt, precision=hp)
    return Y


def _apply_vector3_qf(qf: QFactor, gs: GatherScatter, mask, park, beta,
                      alpha, X):
    """Matrix-free A(beta) apply for h = (hx, hy, hz~) (C = 3).

    Weak form (assembly.vector3_primitives docstring):
        int (1/eps)[|dy hz - b hy|^2 + |b hx - dx hz|^2 + |dx hy - dy hx|^2]
        + alpha int |dx hx + dy hy - b hz|^2
    evaluated per quadrature point and pulled back through the adjoint.
    """
    D = mask.shape[0]
    ed = jnp.concatenate([gs.elem_dofs + c * D for c in range(3)], axis=1)
    maskC = jnp.tile(mask, 3)[:, None].astype(X.dtype)
    Xm = X * maskC
    U = Xm[ed]                                   # (E, 18, k)
    E, _, k = U.shape
    U = U.reshape(E, 3, 6, k)

    V, G = _qp_eval(U, qf)
    Vx, Vy, Vz = V[:, 0], V[:, 1], V[:, 2]       # (E, Q, k)
    Gx, Gy, Gz = G[:, 0], G[:, 1], G[:, 2]       # (E, Q, 2, k)

    c1 = Gz[:, :, 1] - beta * Vy                 # dy hz - b hy
    c2 = beta * Vx - Gz[:, :, 0]                 # b hx - dx hz
    c3 = Gy[:, :, 0] - Gx[:, :, 1]               # dx hy - dy hx
    dv = Gx[:, :, 0] + Gy[:, :, 1] - beta * Vz   # div_t - b hz

    we = (qf.w * qf.inv_eps)[..., None]
    wa = (qf.w * alpha)[..., None]
    c1h = we * c1
    c2h = we * c2
    c3h = we * c3
    dvh = wa * dv

    # value-channel and gradient-channel integrand weights per component
    S = jnp.stack([beta * c2h, -beta * c1h, -beta * dvh], axis=1)
    Tx = jnp.stack([dvh, c3h, -c2h], axis=1)     # d/dx test channels
    Ty = jnp.stack([-c3h, dvh, c1h], axis=1)     # d/dy test channels
    T = jnp.stack([Tx, Ty], axis=3)              # (E, 3, Q, 2, k)

    Ye = _qp_adjoint(S, T, qf).reshape(E, 18, k)
    Y = _accumulate(Ye, gs, 3)
    return Y * maskC + park * (X - Xm)


def _apply_mass_qf(qf: QFactor, gs: GatherScatter, mask, X, C: int,
                   park: float = 1.0):
    """Matrix-free plain-mass apply per component."""
    hp = jax.lax.Precision.HIGHEST
    D = mask.shape[0]
    m = mask[:, None].astype(X.dtype)
    parts = []
    for c in range(C):
        Xc = X[c * D:(c + 1) * D]
        Xm = Xc * m
        U = Xm[gs.elem_dofs]                     # (E, 6, k)
        V = jnp.einsum("qi,eik->eqk", _N_REF, U, precision=hp)
        S = qf.w[..., None] * V
        Ye = jnp.einsum("qi,eqk->eik", _N_REF, S, precision=hp)
        Yc = _accumulate(Ye, gs, 1)
        parts.append(Yc * m + park * (Xc - Xm))
    return jnp.concatenate(parts, axis=0)


def _apply_binv_qf(qf: QFactor, gs: GatherScatter, mask, dinv_sqrt, lo, hi,
                   X, C: int, degree: int):
    """Chebyshev B^{-1} with the matrix-free mass apply."""
    ds = jnp.tile(dinv_sqrt, C)[:, None].astype(X.dtype)

    def scaled(V):
        return ds * _apply_mass_qf(qf, gs, mask, ds * V, C)

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


def cheb_rr_pass_qf_impl(qf, gs, mask, dinv_sqrt, lo, hi, park, beta,
                         alpha, X, cut, bound, degree: int = 300,
                         binv_degree: int = 4, renorm_every: int = 8):
    """Quadrature-factor variant of cheb_rr_pass_impl (C = 3 vectorial).

    ``beta`` is traced — beta passes and per-design beta values reuse
    one executable. ``binv_degree`` defaults lower than the blocks path:
    the f32 subspace floor is set by quasi-degenerate cluster mixing
    (resolved exactly by the host f64 polish), so a looser approximate
    B^{-1} costs nothing in final accuracy.
    """
    c = (0.5 * (bound + cut)).astype(jnp.float32)
    h = (0.5 * (bound - cut)).astype(jnp.float32)

    if binv_degree == 0:
        # HRZ-lumped mass inverse (see _sweep_apply_t); caller widens
        # ``bound`` by _LUMP_BOUND
        ilump = (jnp.tile(dinv_sqrt, 3)**2
                 / jnp.float32(_HRZ_SCALE))[:, None]

        def apply_t(V):
            W = _apply_vector3_qf(qf, gs, mask, park, beta, alpha, V)
            return (W * ilump - c * V) / h
    else:
        def apply_t(V):
            W = _apply_vector3_qf(qf, gs, mask, park, beta, alpha, V)
            W = _apply_binv_qf(qf, gs, mask, dinv_sqrt, lo, hi, W, 3,
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

    hp = jax.lax.Precision.HIGHEST
    Q, _ = jnp.linalg.qr(Xf)
    AQ = _apply_vector3_qf(qf, gs, mask, park, beta, alpha, Q)
    BQ = _apply_mass_qf(qf, gs, mask, Q, 3)
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


cheb_rr_pass_qf = partial(jax.jit, static_argnames=(
    "degree", "binv_degree", "renorm_every"))(cheb_rr_pass_qf_impl)

_QF_BATCH_AXES = (0, 0, 0, 0, None, None, 0, 0, None, 0, 0, 0)


@partial(jax.jit, static_argnames=("degree", "binv_degree", "renorm_every"))
def cheb_rr_pass_qf_batched(qf, gs, mask, dinv_sqrt, lo, hi, park, beta,
                            alpha, X, cut, bound, degree: int = 300,
                            binv_degree: int = 4, renorm_every: int = 8):
    fn = partial(cheb_rr_pass_qf_impl, degree=degree,
                 binv_degree=binv_degree, renorm_every=renorm_every)
    return jax.vmap(fn, in_axes=_QF_BATCH_AXES)(
        qf, gs, mask, dinv_sqrt, lo, hi, park, beta, alpha, X, cut, bound)


# ---------------------------------------------------------------------------
# same-grid sweep: B designs packed along the lane axis
# ---------------------------------------------------------------------------
#
# Gather cost on TPU is per-ROW (measured ~constant from k=22 to k=64),
# so packing a sweep of B same-grid designs into X (CD, B, k) amortizes
# every gather over B designs: the topology (gs, invJT, w, mass) is
# shared; only 1/eps, beta, cut, park vary per design and enter as
# broadcast weights. This is the multi-band/multi-delta-n dataset
# workload (BASELINE config 2) — B designs for roughly the cost of one.


class QFactorSweep(NamedTuple):
    invJT: jax.Array      # (E, 2, 2) shared
    w: jax.Array          # (E, Q) shared
    inv_eps: jax.Array    # (B, E, Q) per design
    gp: jax.Array         # (E, Q, 6, 2) physical shape gradients (shared)


# -- fused-lane layout --------------------------------------------------
#
# The sweep recurrence runs in layout (D, 3*B*k): components join designs
# and subspace columns on the LANE axis. Gather cost on TPU is per-ROW
# (measured constant from k=22 to k=64 lanes), so one (E, 6)-row gather
# of width 3*B*k replaces the component-major layout's (E, 18)-row
# gathers — 3x fewer gathered rows in the A apply AND in every mass /
# B^{-1} apply (which previously looped the gather per component).
# Layout conversion happens once per pass boundary, never inside the
# Chebyshev loop.


def _fused_from_stacked(X):
    """(3D, B, k) component-major -> (D, B, 3, k) fused-lane.

    The design axis B sits OUTERMOST in the lane group (B, 3, k): a
    `designs` mesh-axis sharding of B then propagates through the
    (D, B*3*k) merge, so the same kernel runs single-chip (full lanes)
    and multi-chip (lane block per device) with no layout change.
    """
    CD, B, k = X.shape
    D = CD // 3
    return jnp.transpose(X.reshape(3, D, B, k), (1, 2, 0, 3))


def _stacked_from_fused(Xf):
    """(D, B, 3, k) fused-lane -> (3D, B, k) component-major."""
    D, B, C, k = Xf.shape
    return jnp.transpose(Xf, (2, 0, 1, 3)).reshape(C * D, B, k)


class BlkTables(NamedTuple):
    """Block-accumulate drop-in for :class:`GatherScatter` (fused path).

    ``elem_dofs`` (slots, 6) indexes BLOCK-ordered dof rows; the
    accumulate is a batched 0/1-selector matmul instead of gather-sum
    tables (see ops/blockplan.py). Built when PL_FEM_ACC=blk.
    """

    elem_dofs: jax.Array     # (slots, 6) int32, block-row dof ids
    S: jax.Array             # (NB, TILEP, CNT*6) bf16 0/1 selector


def _accumulate_fused(Ye, gs):
    """(E, 6, L) element results -> (D, L) DOF sums.

    GatherScatter: bounded-valence split gather-sum tables (row-latency
    ~48 ns/row). BlkTables: one batched MXU matmul against the 0/1
    block selector — bf16 selector entries are exact and the MXU
    accumulates f32, so the hi/lo bf16 split of Ye keeps ~2^-16
    relative accuracy (scratch/acc_blk.py parity 3.3e-6 vs gather-sum).
    """
    E, six, L = Ye.shape
    if isinstance(gs, BlkTables):
        NB, TILEP, C6 = gs.S.shape
        Z = Ye.reshape(NB, C6, L)
        hi = Z.astype(jnp.bfloat16)
        lo = (Z - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        Y = (jax.lax.dot_general(gs.S, hi, dn,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(gs.S, lo, dn,
                                   preferred_element_type=jnp.float32))
        return Y.reshape(NB * TILEP, L)
    flat = Ye.reshape(E * six, L)
    pv = jnp.where(gs.valid_v[..., None], flat[gs.idx_v], 0.0).sum(axis=1)
    pe = jnp.where(gs.valid_e[..., None], flat[gs.idx_e], 0.0).sum(axis=1)
    return jnp.concatenate([pv, pe], axis=0)


def _apply_vector3_fused(qs: QFactorSweep, gs: GatherScatter, mask, parks,
                         betas, alpha, Xf):
    """Packed A(beta_b) apply in fused-lane layout.

    Xf: (D, B, 3, k) -> (D, B, 3, k). One (E, 6)-row gather/accumulate
    pair serves all components, designs and columns.

    The 6-wide shape-function contractions are UNROLLED into VPU
    broadcast-FMA chains instead of einsums: a contraction dim of 6 on
    the 128x128 MXU runs at <5% utilization (x6 passes under HIGHEST
    emulation), measured 67 ms of an 84 ms apply at bench size; the
    unrolled form is traffic-bound instead (~3 GFLOP of VPU work).
    """
    D, B, C, k = Xf.shape
    L = B * C * k
    m = mask[:, None].astype(Xf.dtype)
    Xl = Xf.reshape(D, L)
    Xm = Xl * m
    # transposed index table -> per-local-dof slices are contiguous
    U = Xm[gs.elem_dofs.T].reshape(6, -1, B, C, k)   # (6, E, B, 3, k)
    E = U.shape[1]

    # Physical gradients come from the PRECOMPUTED per-element table
    # gp (E, Q, 6, 2) — 72 floats/element, streamed once per apply.
    gpx = qs.gp[..., 0]                              # (E, Q, 6)
    gpy = qs.gp[..., 1]
    Nq = np.asarray(_N_REF)                          # (Q, 6) constants
    Qn = Nq.shape[0]
    b = betas[None, :, None]                         # over (E, B, k)
    Ui = [U[i] for i in range(6)]                    # (E, B, 3, k) each
    Y = [None] * 6
    for q in range(Qn):
        V = sum(float(Nq[q, i]) * Ui[i] for i in range(6))
        gx = gpx[:, q, :]                            # (E, 6)
        gy = gpy[:, q, :]
        Gx = sum(gx[:, i, None, None, None] * Ui[i] for i in range(6))
        Gy = sum(gy[:, i, None, None, None] * Ui[i] for i in range(6))
        c1 = Gy[:, :, 2] - b * V[:, :, 1]            # dy hz - b hy
        c2 = b * V[:, :, 0] - Gx[:, :, 2]            # b hx - dx hz
        c3 = Gx[:, :, 1] - Gy[:, :, 0]               # dx hy - dy hx
        dv = Gx[:, :, 0] + Gy[:, :, 1] - b * V[:, :, 2]

        we = (qs.w[:, q, None] * qs.inv_eps[:, :, q].T)[..., None]
        wa = (qs.w[:, q] * alpha)[:, None, None]
        c1h = we * c1
        c2h = we * c2
        c3h = we * c3
        dvh = wa * dv

        S = jnp.stack([b * c2h, -b * c1h, -b * dvh], axis=2)
        Tx = jnp.stack([dvh, c3h, -c2h], axis=2)     # (E, B, 3, k)
        Ty = jnp.stack([-c3h, dvh, c1h], axis=2)
        for i in range(6):
            t = (float(Nq[q, i]) * S
                 + gx[:, i, None, None, None] * Tx
                 + gy[:, i, None, None, None] * Ty)
            Y[i] = t if Y[i] is None else Y[i] + t
    Ye = jnp.stack(Y, axis=1)                        # (E, 6, B, 3, k)
    Yd = _accumulate_fused(Ye.reshape(E, 6, L), gs) * m
    pk = jnp.broadcast_to(parks[None, :, None, None], Xf.shape) \
        .reshape(D, L)
    return (Yd + pk * (Xl - Xm)).reshape(D, B, C, k)


def _apply_vector3_flat(qs: QFactorSweep, gs: GatherScatter, mask, parks,
                        betas, alpha, Xf):
    """A(beta) apply with the q-loop on component-split FLAT lanes.

    Same algebra as :func:`_apply_vector3_fused`, but the per-element
    math runs on three (E, B*k) arrays instead of one (E, B, 3, k): the
    packed shape tiles at ~6% utilization (minor dim k=22 of 128 lanes,
    second-minor 3 of 8 sublanes) and measured 40-55 ms at sweep lanes
    when its gather (2.5 ms) and accumulate (10.5 ms) don't
    (scratch/apply_v2.py A/B; micro_r2.log baseline). Selected by
    PL_FEM_APPLY_LAYOUT=flat.
    """
    D, B, C, k = Xf.shape
    L = B * C * k
    BK = B * k
    m = mask[:, None].astype(Xf.dtype)
    Xl = Xf.reshape(D, L)
    Xm = Xl * m
    U = Xm[gs.elem_dofs.T].reshape(6, -1, B, C, k)   # (6, E, B, 3, k)
    E = U.shape[1]
    Us = jnp.transpose(U, (3, 0, 1, 2, 4)).reshape(C, 6, E, BK)
    Uc = [[Us[c, i] for i in range(6)] for c in range(C)]

    gpx = qs.gp[..., 0]                              # (E, Q, 6)
    gpy = qs.gp[..., 1]
    Nq = np.asarray(_N_REF)
    Qn = Nq.shape[0]
    b = jnp.repeat(betas, k)[None, :]                # (1, BK) lane vec
    ie_rep = [jnp.repeat(qs.inv_eps[:, :, q].T, k, axis=1)
              for q in range(Qn)]                    # (E, BK) each

    Y = [[None] * 6 for _ in range(C)]
    for q in range(Qn):
        gx = gpx[:, q, :]                            # (E, 6)
        gy = gpy[:, q, :]
        V = [sum(float(Nq[q, i]) * Uc[c][i] for i in range(6))
             for c in range(C)]
        Gx = [sum(gx[:, i, None] * Uc[c][i] for i in range(6))
              for c in range(C)]
        Gy = [sum(gy[:, i, None] * Uc[c][i] for i in range(6))
              for c in range(C)]
        c1 = Gy[2] - b * V[1]                        # dy hz - b hy
        c2 = b * V[0] - Gx[2]                        # b hx - dx hz
        c3 = Gx[1] - Gy[0]                           # dx hy - dy hx
        dv = Gx[0] + Gy[1] - b * V[2]

        we = qs.w[:, q, None] * ie_rep[q]            # (E, BK)
        wa = (qs.w[:, q] * alpha)[:, None]
        c1h = we * c1
        c2h = we * c2
        c3h = we * c3
        dvh = wa * dv

        S = (b * c2h, -b * c1h, -b * dvh)
        Tx = (dvh, c3h, -c2h)
        Ty = (-c3h, dvh, c1h)
        for c in range(C):
            for i in range(6):
                t = (float(Nq[q, i]) * S[c]
                     + gx[:, i, None] * Tx[c]
                     + gy[:, i, None] * Ty[c])
                Y[c][i] = t if Y[c][i] is None else Y[c][i] + t
    # (3, 6, E, BK) -> (E, 6, B, 3, k) -> (E, 6, L)
    Ys = jnp.stack([jnp.stack(Y[c], axis=0) for c in range(C)], axis=0)
    Ye = jnp.transpose(Ys.reshape(C, 6, E, B, k), (2, 1, 3, 0, 4))
    Yd = _accumulate_fused(Ye.reshape(E, 6, L), gs) * m
    pk = jnp.broadcast_to(parks[None, :, None, None], Xf.shape) \
        .reshape(D, L)
    return (Yd + pk * (Xl - Xm)).reshape(D, B, C, k)


def _sweep_apply_A(qs, gs, mask, parks, betas, alpha, Xf,
                   layout: str = "packed"):
    """Layout-dispatched sweep A apply.

    ``layout`` arrives as an EXPLICIT (static) argument threaded from
    ``SolverConfig.apply_layout`` — never read from the environment
    here: this function runs under trace, and the jit cache would not
    key on an env read (toggling the knob in-process silently reused
    the stale executable; round-3 verdict finding)."""
    if layout == "flat":
        return _apply_vector3_flat(qs, gs, mask, parks, betas, alpha, Xf)
    if layout != "packed":
        raise ValueError(f"unknown apply layout {layout!r} "
                         "(expected 'packed' or 'flat')")
    return _apply_vector3_fused(qs, gs, mask, parks, betas, alpha, Xf)


def _apply_mass_fused(qs: QFactorSweep, gs: GatherScatter, mask, Xl,
                      park: float = 1.0):
    """Plain-mass apply on fused lanes: (D, L) -> (D, L).

    The element mass is the dense 6x6 matrix C_ij(e) = sum_q w[e,q] *
    N[q,i] N[q,j]; its 21 unique coefficients are (E,)-vectors derived
    from the 4 quadrature weights (VPU-trivial, fused), so the apply is
    36 broadcast-FMAs in a SINGLE pass over the gathered U — the
    q-looped form re-streamed U four times (measured +5 ms at bench
    size) and the einsum form hits the MXU small-contraction cliff.
    """
    m = mask[:, None].astype(Xl.dtype)
    Xm = Xl * m
    U = Xm[gs.elem_dofs.T]                        # (6, E, L)
    Nq = np.asarray(_N_REF)
    Ui = [U[i] for i in range(6)]
    w = qs.w                                      # (E, Q)
    C = {}
    for i in range(6):
        for j in range(i, 6):
            coef = Nq[:, i] * Nq[:, j]            # (Q,) constants
            C[i, j] = sum(float(coef[q]) * w[:, q]
                          for q in range(Nq.shape[0]))[:, None]
    Y = [None] * 6
    for i in range(6):
        acc = None
        for j in range(6):
            t = C[min(i, j), max(i, j)] * Ui[j]
            acc = t if acc is None else acc + t
        Y[i] = acc
    Ye = jnp.stack(Y, axis=1)                     # (E, 6, L)
    Y = _accumulate_fused(Ye, gs)
    return Y * m + park * (Xl - Xm)


def _apply_binv_fused(qs: QFactorSweep, gs: GatherScatter, mask, dinv_sqrt,
                      lo, hi, Xl, degree: int):
    """Chebyshev B^{-1} semi-iteration on fused lanes."""
    ds = dinv_sqrt[:, None].astype(Xl.dtype)

    def scaled(V):
        return ds * _apply_mass_fused(qs, gs, mask, ds * V)

    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    sigma1 = theta / delta
    Yh = ds * Xl
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


def _sweep_apply_t(qs, gs, mask, dinv_sqrt, lo, hi, parks, betas, alpha,
                   cuts, bounds, D, B, k, binv_degree,
                   layout: str = "packed"):
    """Shifted-scaled filter operator T = (B^{-1}A - c) / h, fused.

    ``binv_degree == 0`` selects the HRZ-LUMPED mass inverse: B_l =
    c_H * diag(B) (exact on affine P2 elements, where the assembled
    consistent-mass diagonal times the reference trace ratio IS the
    HRZ row-lumped mass), so B^{-1} is one elementwise scale instead
    of ``binv_degree`` extra mass applies per Chebyshev step — the
    step drops from ~(1 + binv) applies to ONE A-apply. The filtered
    subspace then approximates (A, B_l) eigenvectors; the consistent-
    mass Rayleigh-Ritz tail and the host f64 polish of the TRUE pencil
    are unchanged, so only subspace-steering quality is affected.
    Selectivity near the cut survives because the lumped/consistent
    Rayleigh-quotient ratio is 1 + O(h^2) for smooth fields (guided
    and near-edge modes); only rough high-theta junk sees the full
    per-element spread [0.25, 1.30], far inside the suppression band.
    Callers widen ``bounds`` by _LUMP_BOUND when lumping (lambda_max
    can grow by at most the spread's upper edge).
    """
    if binv_degree == 0:
        ilump = (dinv_sqrt * dinv_sqrt
                 / jnp.float32(_HRZ_SCALE))[:, None, None, None]

        def binv_f(Vf):                           # (D, B, 3, k)
            return Vf * ilump
    else:
        def binv_f(Vf):                           # (D, B, 3, k)
            Vl = Vf.reshape(D, 3 * B * k)
            return _apply_binv_fused(qs, gs, mask, dinv_sqrt, lo, hi, Vl,
                                     binv_degree).reshape(D, B, 3, k)

    c = (0.5 * (bounds + cuts)).astype(jnp.float32)[None, :, None, None]
    h = (0.5 * (bounds - cuts)).astype(jnp.float32)[None, :, None, None]

    def apply_t(Vf):
        W = _sweep_apply_A(qs, gs, mask, parks, betas, alpha, Vf, layout)
        W = binv_f(W)
        return (W - c * Vf) / h

    return apply_t


def _sweep_iterate(apply_t, T0, T1, steps, renorm_every):
    def body(i, carry):
        T0, T1 = carry
        T2 = 2.0 * apply_t(T1) - T0
        do = (i % renorm_every) == (renorm_every - 1)
        s = 1.0 / (jnp.linalg.norm(T2, axis=(0, 2), keepdims=True) + 1e-30)
        s = jnp.where(do, s, jnp.ones_like(s))
        return T1 * s, T2 * s

    return jax.lax.fori_loop(0, steps, body, (T0, T1))


def cheb_sweep_chunk_impl(qs, gs, mask, dinv_sqrt, lo, hi, parks, betas,
                          alpha, T0, T1, cuts, bounds, steps,
                          first, binv_degree: int = 4,
                          renorm_every: int = 8,
                          layout: str = "packed"):
    """Advance the sweep recurrence by ``steps`` (one bounded dispatch).

    Splitting the degree loop across dispatches exists because single
    XLA programs running longer than roughly a minute get the TPU
    worker killed ("kernel fault"): the crash reproduces at fixed
    shapes by raising only degree/binv (and disappears when the same
    work is issued as shorter dispatches). State (T0, T1) stays on
    device in the fused-lane layout between calls.

    ``steps`` (int32) and ``first`` (bool) are TRACED so one executable
    serves every chunk length, every degree and both the opening and
    continuation chunks — the round-2 static variants compiled three
    distinct production-shape executables per bucket for no runtime
    benefit (the loop lowers to while_loop either way).
    """
    D, B, _, k = T0.shape
    apply_t = _sweep_apply_t(qs, gs, mask, dinv_sqrt, lo, hi, parks,
                             betas, alpha, cuts, bounds, D, B, k,
                             binv_degree, layout)
    first = jnp.asarray(first, bool)
    T1 = jax.lax.cond(first, lambda: apply_t(T0), lambda: T1)
    steps = jnp.asarray(steps, jnp.int32) - first.astype(jnp.int32)
    return _sweep_iterate(apply_t, T0, T1, steps, renorm_every)


cheb_sweep_chunk = partial(jax.jit, static_argnames=(
    "binv_degree", "renorm_every", "layout"))(cheb_sweep_chunk_impl)


def cheb_sweep_rr_impl(qs, gs, mask, parks, betas, alpha, Xff,
                       layout: str = "packed"):
    """Rayleigh-Ritz tail on a filtered fused-lane subspace."""
    D, B, _, k = Xff.shape
    Xf = _stacked_from_fused(Xff)

    def mass_flat(V):
        Vl = _fused_from_stacked(V).reshape(D, 3 * B * k)
        out = _apply_mass_fused(qs, gs, mask, Vl)
        return _stacked_from_fused(out.reshape(D, B, 3, k))

    def _apply_A(V):
        return _stacked_from_fused(_sweep_apply_A(
            qs, gs, mask, parks, betas, alpha, _fused_from_stacked(V),
            layout))

    # per-design QR (vmapped small-path), packed applies for A/B
    hp = jax.lax.Precision.HIGHEST
    Q = jax.vmap(lambda x: jnp.linalg.qr(x)[0])(
        jnp.moveaxis(Xf, 1, 0))                   # (B, CD, k)
    Qp = jnp.moveaxis(Q, 0, 1)                    # (CD, B, k)
    AQ = _apply_A(Qp)
    BQ = mass_flat(Qp)
    H = jnp.einsum("dbk,dbl->bkl", Qp, AQ, precision=hp)
    G = jnp.einsum("dbk,dbl->bkl", Qp, BQ, precision=hp)
    H = 0.5 * (H + jnp.swapaxes(H, 1, 2))
    G = 0.5 * (G + jnp.swapaxes(G, 1, 2))
    G = G + (1e-6 * jnp.trace(G, axis1=1, axis2=2)[:, None, None] / k) \
        * jnp.eye(k, dtype=G.dtype)[None]

    def rr_small(Hb, Gb):
        L = jnp.linalg.cholesky(Gb)
        Hw = jax.scipy.linalg.solve_triangular(L, Hb, lower=True)
        Hw = jax.scipy.linalg.solve_triangular(L, Hw.T, lower=True)
        Hw = 0.5 * (Hw + Hw.T)
        theta, W = jnp.linalg.eigh(Hw)
        Y = jax.scipy.linalg.solve_triangular(L.T, W, lower=False)
        return theta, Y

    theta, Ys = jax.vmap(rr_small)(H, G)          # (B, k), (B, k, k)
    Xr = jnp.einsum("dbk,bkl->dbl", Qp, Ys, precision=hp)
    AXr = jnp.einsum("dbk,bkl->dbl", AQ, Ys, precision=hp)
    BXr = jnp.einsum("dbk,bkl->dbl", BQ, Ys, precision=hp)
    Rs = AXr - BXr * theta[None]                  # (CD, B, k)
    res = (jnp.linalg.norm(Rs, axis=0)
           / (jnp.linalg.norm(AXr, axis=0) + 1e-30))   # (B, k)
    return theta, Xr, res


cheb_sweep_rr = partial(jax.jit, static_argnames=("layout",))(
    cheb_sweep_rr_impl)


def cheb_rr_pass_sweep_impl(qs, gs, mask, dinv_sqrt, lo, hi, parks, betas,
                            alpha, X, cuts, bounds, degree: int = 300,
                            binv_degree: int = 4, renorm_every: int = 8,
                            layout: str = "packed"):
    """Packed sweep filter + per-design Rayleigh-Ritz (one dispatch).

    X: (3D, B, k); parks/betas/cuts/bounds: (B,). The Chebyshev
    recurrence runs in the fused-lane layout (see above); mass/binv are
    shared (same grid). Returns per-design (theta (B, k), X (3D, B, k),
    res (B, k)). Large problems go through the chunked driver below
    instead (same math, bounded dispatch length).
    """
    CD, B, k = X.shape
    D = CD // 3
    apply_t = _sweep_apply_t(qs, gs, mask, dinv_sqrt, lo, hi, parks,
                             betas, alpha, cuts, bounds, D, B, k,
                             binv_degree, layout)
    T0 = _fused_from_stacked(X.astype(jnp.float32))
    T1 = apply_t(T0)
    _, Xff = _sweep_iterate(apply_t, T0, T1, degree - 1, renorm_every)
    return cheb_sweep_rr_impl(qs, gs, mask, parks, betas, alpha, Xff,
                              layout)


cheb_rr_pass_sweep = partial(jax.jit, static_argnames=(
    "degree", "binv_degree", "renorm_every", "layout"))(
        cheb_rr_pass_sweep_impl)

# Per-step cost model for dispatch sizing (TPU, measured r2: B=8,
# E=21504, k=22, binv=4 -> 87 ms/step): seconds/step ~ COEF * E*B*k *
# (1 + binv_degree). The watchdog kills dispatches around a minute;
# target ~10 s per dispatch with wide margin.
_STEP_COEF = 4.6e-9
_DISPATCH_TARGET_S = 10.0


# -- design-parallel sharding of the sweep kernels ----------------------
#
# The fused-lane layout keeps the design axis B separable end to end
# (every reduction in the chunk/RR kernels is per-design), so a
# `shard_map` over a 1-D 'designs' device mesh runs each device's
# design slice through the IDENTICAL kernel code with ZERO collectives
# on the hot path — the TPU-native scale-out of the reference's serial
# per-design loop (/root/reference/main.py:343-386; SURVEY.md §2.1).
# Shared topology (gather tables, invJT, w, gp, mask) is replicated;
# only inv_eps, the per-design scalars and the subspace shard.

_SHARDED_CACHE: dict = {}


def _sweep_sharded_fns(mesh, binv_degree: int, renorm_every: int,
                       blk: bool = False, layout: str = "packed"):
    """(chunk_fn, rr_fn) jitted shard_map wrappers for a device mesh."""
    from jax.sharding import PartitionSpec as P

    key = (tuple(d.id for d in mesh.devices.flat), binv_degree,
           renorm_every, blk, layout)
    hit = _SHARDED_CACHE.get(key)
    if hit is not None:
        return hit

    qs_spec = QFactorSweep(invJT=P(), w=P(), inv_eps=P("designs"), gp=P())
    # topology tables replicate whichever container carries them
    gs_spec = BlkTables(elem_dofs=P(), S=P()) if blk else \
        GatherScatter(elem_dofs=P(), idx_v=P(), valid_v=P(),
                      idx_e=P(), valid_e=P())
    d_spec = P("designs")            # (B,) per-design scalars
    t_spec = P(None, "designs")      # (D, B, 3, k) fused-lane state

    def chunk_local(qs, gs, mask, dinv_sqrt, lo, hi, parks, betas, alpha,
                    T0, T1, cuts, bounds, steps, first):
        return cheb_sweep_chunk_impl(
            qs, gs, mask, dinv_sqrt, lo, hi, parks, betas, alpha, T0, T1,
            cuts, bounds, steps, first, binv_degree=binv_degree,
            renorm_every=renorm_every, layout=layout)

    chunk_fn = jax.jit(jax.shard_map(
        chunk_local, mesh=mesh,
        in_specs=(qs_spec, gs_spec, P(), P(), P(), P(), d_spec, d_spec,
                  P(), t_spec, t_spec, d_spec, d_spec, P(), P()),
        out_specs=(t_spec, t_spec)))

    def rr_local(qs, gs, mask, parks, betas, alpha, Xff):
        return cheb_sweep_rr_impl(qs, gs, mask, parks, betas, alpha, Xff,
                                  layout)

    rr_fn = jax.jit(jax.shard_map(
        rr_local, mesh=mesh,
        in_specs=(qs_spec, gs_spec, P(), d_spec, d_spec, P(), t_spec),
        out_specs=(d_spec, P(None, "designs"), d_spec)))

    if len(_SHARDED_CACHE) > 8:
        _SHARDED_CACHE.clear()
    _SHARDED_CACHE[key] = (chunk_fn, rr_fn)
    return chunk_fn, rr_fn


def cheb_rr_pass_sweep_auto(qs, gs, mask, dinv_sqrt, lo, hi, parks, betas,
                            alpha, X, cuts, bounds, degree: int = 300,
                            binv_degree: int = 4, renorm_every: int = 8,
                            mesh=None, layout: str = "packed"):
    """Pass driver that splits long recurrences into bounded dispatches.

    Always routes through the chunk + RR executables (never the fused
    single-dispatch ``cheb_rr_pass_sweep``): with traced chunk lengths
    exactly TWO programs compile per bucket shape regardless of degree,
    chunking or pass count — the dominant term in a cold-cache bench
    warmup (BENCH_r02 post-mortem).

    ``mesh``: an optional 1-D 'designs' jax device mesh; the B axis is
    laid over it via shard_map (B must divide by mesh size — the caller
    pads) and each device runs its design slice of the SAME kernels.
    """
    CD, B, k = X.shape
    E = qs.w.shape[0]
    n_dev = 1
    if mesh is not None and mesh.size > 1:
        if B % mesh.size:
            raise ValueError(f"sweep width {B} not divisible by the "
                             f"{mesh.size}-device mesh")
        n_dev = mesh.size
    # per-DEVICE work sets the dispatch length
    est_step = _STEP_COEF * E * (B // n_dev) * k * (1 + binv_degree)
    max_steps = max(int(_DISPATCH_TARGET_S / max(est_step, 1e-12)), 8)
    chunk = min(degree, max_steps)
    chunk = max(((chunk + renorm_every - 1) // renorm_every)
                * renorm_every, renorm_every)
    if n_dev > 1:
        chunk_fn, rr_fn = _sweep_sharded_fns(mesh, binv_degree,
                                             renorm_every,
                                             blk=isinstance(gs, BlkTables),
                                             layout=layout)
    else:
        chunk_fn = partial(cheb_sweep_chunk, binv_degree=binv_degree,
                           renorm_every=renorm_every, layout=layout)
        rr_fn = partial(cheb_sweep_rr, layout=layout)
    T0 = _fused_from_stacked(X.astype(jnp.float32))
    T1 = T0
    done, first = 0, True
    while done < degree:
        n = min(chunk, degree - done)
        T0, T1 = chunk_fn(
            qs, gs, mask, dinv_sqrt, lo, hi, parks, betas, alpha, T0, T1,
            cuts, bounds, np.int32(n), np.bool_(first))
        done += n
        first = False
    return rr_fn(qs, gs, mask, parks, betas, alpha, T1)


@partial(jax.jit, static_argnames=("n_wanted",))
def _sweep_gate_maxres(theta, res, cuts, n_wanted: int = 0):
    """Device-side convergence statistic for the sweep pass gate.

    Reduces (B, k) theta/res to ONE scalar on device (worst residual
    among the wanted sub-cut modes; the min residual if nothing is
    wanted yet). The old host-side gate pulled both full (B, k) arrays
    through the axon tunnel once per pass; under a 'designs' mesh the
    inputs are design-sharded and XLA inserts the reduce collective —
    the host reads a single replicated scalar either way."""
    wanted = theta < cuts[:, None]
    if n_wanted > 0:
        wanted &= jnp.arange(theta.shape[1])[None, :] < n_wanted
    maxres = jnp.where(wanted, res, -jnp.inf).max()
    return jnp.where(wanted.any(), maxres, res.min())


def solve_lowest_sweep(qs: QFactorSweep, gs, mask, diag_B, X0, cuts, betas,
                       alpha, bounds, degree: int = 300, passes: int = 2,
                       tol: float = 1e-7, max_passes: int = 8,
                       parks=None, binv_degree: int = 4,
                       n_wanted: int = 0, mesh=None, blk=None,
                       layout: str = "packed"):
    """Adaptive driver for the packed same-grid sweep.

    ``mesh``: optional 'designs' device mesh — the sweep's design axis
    shards over it (see :func:`_sweep_sharded_fns`).

    ``blk``: optional ops.blockplan.BlockPlan — qs/gs/mask/diag_B are
    then slot-/block-ordered (caller's contract) and X converts to and
    from block-dof order at this boundary (two (D,)-row gathers per
    call, negligible next to the filter).
    """
    import logging
    import time

    _log = logging.getLogger("pl_fem_tpu.kernels")
    eff_tol = max(tol, 5e-6)
    dinv_sqrt = (1.0 / jnp.sqrt(jnp.maximum(diag_B, 1e-30))
                 ).astype(jnp.float32)
    lo = jnp.asarray(MASS_LO, jnp.float32)
    hi = jnp.asarray(MASS_HI, jnp.float32)
    cuts = jnp.asarray(cuts, jnp.float32)
    betas = jnp.asarray(betas, jnp.float32)
    parks = jnp.asarray(parks if parks is not None else 10.0 * cuts,
                        jnp.float32)
    bounds = jnp.asarray(bounds, jnp.float32)
    if binv_degree == 0:
        # lumped-mass pencil: lambda_max can exceed the consistent
        # bound by the per-element equivalence spread's upper edge
        bounds = bounds * jnp.float32(_LUMP_BOUND)
    bounds = jnp.maximum(bounds, parks * 1.05)
    X = X0.astype(jnp.float32)
    if blk is not None:
        to_b, bval, from_b, nval = blk.device_perms()
        CD, Bn, kk = X.shape
        X = (X.reshape(3, CD // 3, Bn, kk)[:, to_b]
             * bval[None, :, None, None].astype(X.dtype)
             ).reshape(3 * len(to_b), Bn, kk)
    theta = Xr = res = None
    prev = np.inf
    for ip in range(max_passes):
        t0 = time.perf_counter()
        theta, Xr, res = cheb_rr_pass_sweep_auto(
            qs, gs, mask, dinv_sqrt, lo, hi, parks, betas,
            jnp.float32(alpha), X, cuts, bounds, degree=degree,
            binv_degree=binv_degree, mesh=mesh, layout=layout)
        X = Xr
        if ip + 1 >= passes:
            maxres = float(_sweep_gate_maxres(theta, res, cuts,
                                              n_wanted=n_wanted))
            _log.debug("sweep pass %d (deg %d, binv %d): %.2fs "
                       "maxres=%.2e", ip, degree, binv_degree,
                       time.perf_counter() - t0, maxres)
            if maxres < eff_tol or maxres > 0.7 * prev:
                break
            prev = maxres
    if blk is not None:
        CD, Bn, kk = Xr.shape
        Xr = (Xr.reshape(3, CD // 3, Bn, kk)[:, from_b]
              * nval[None, :, None, None].astype(Xr.dtype)
              ).reshape(3 * len(from_b), Bn, kk)
    return theta, Xr, res


def solve_lowest_qf(qf, gs, mask, diag_B, X0, cut, beta, alpha, bound,
                    degree: int = 300, passes: int = 2, tol: float = 1e-7,
                    max_passes: int = 8, park: float = 1.0,
                    binv_degree: int = 4, n_wanted: int = 0):
    """Adaptive driver for the quadrature-factor vectorial path."""
    eff_tol = max(tol, 5e-6)
    dinv_sqrt = (1.0 / jnp.sqrt(jnp.maximum(diag_B, 1e-30))
                 ).astype(jnp.float32)
    lo = jnp.asarray(MASS_LO, jnp.float32)
    hi = jnp.asarray(MASS_HI, jnp.float32)
    bound = jnp.asarray(bound, jnp.float32)
    if binv_degree == 0:
        bound = bound * jnp.float32(_LUMP_BOUND)
    bound = jnp.maximum(bound, jnp.float32(park * 1.05))
    X = X0.astype(jnp.float32)
    theta = Xr = res = None
    prev = np.inf
    for ip in range(max_passes):
        theta, Xr, res = cheb_rr_pass_qf(
            qf, gs, mask, dinv_sqrt, lo, hi, jnp.float32(park),
            jnp.float32(beta), jnp.float32(alpha), X, jnp.float32(cut),
            bound, degree=degree, binv_degree=binv_degree)
        X = Xr
        if ip + 1 >= passes:
            th = np.asarray(theta)
            rs = np.asarray(res)
            wanted = th < cut
            if n_wanted > 0:
                wanted = wanted & (np.arange(len(th)) < n_wanted)
            maxres = rs[wanted].max() if wanted.any() else rs.min()
            if maxres < eff_tol or maxres > 0.7 * prev:
                break
            prev = maxres
    return theta, Xr, res


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

# HRZ mass lumping on the reference element: d_i = B_ref[i,i] * c_H with
# c_H = area / trace(B_ref) (total mass preserved). On affine elements
# the local mass is |detJ| B_ref, so the ASSEMBLED consistent diagonal
# times c_H is exactly the assembled HRZ lumped mass. The eigenvalues of
# D_l^{-1} B_ref bound the lumped/consistent Rayleigh-quotient ratio per
# element: [0.2485, 1.3046] for P2/Dunavant-4; _LUMP_BOUND pads the
# upper edge for the (A, B_l) spectrum bound.
_HRZ_SCALE = float(np.sum(_reference_tensors()[2]) / np.trace(_B_REF))
_LUMP_BOUND = 1.40


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
    # |detJ|_e recovered from the local mass trace (B_e = |detJ| B_ref).
    # Floor at the dtype tiny (1e-300 underflows to 0 in f32 — a no-op
    # floor) and mask invalid elements BEFORE the division so a padded or
    # degenerate element can never produce an inf/NaN Gershgorin row.
    detj = (jnp.einsum("eii->e", Bblk)
            / jnp.asarray(np.trace(_B_REF), dtype=dtype))
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 1e3, dtype=dtype)
    detj = jnp.where(elem_valid, jnp.maximum(detj, tiny), 1.0)
    Linv3 = jnp.zeros((6 * C, 6 * C), dtype=dtype)
    Lref = jnp.asarray(_LINV_REF, dtype=dtype)
    for c in range(C):
        Linv3 = Linv3.at[6 * c:6 * c + 6, 6 * c:6 * c + 6].set(Lref)
    W = jnp.einsum("ij,ejk,lk->eil", Linv3,
                   Abig / detj[:, None, None], Linv3,
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
