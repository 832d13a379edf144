"""Matrix-free block operators over element matrices.

An operator apply is gather -> batched (6x6 or 2x2-of-6x6) matmul ->
segment-sum scatter; the matmul is a large batched GEMM that XLA tiles
onto the MXU, and the gather/scatter are the only irregular-memory ops.
This replaces the global sparse matrices of the reference (scipy CSR from
skfem asm, solver_fem.py:153-167) — FEM structure is kept element-local,
which is the natural TPU layout.

Dirichlet boundary conditions are imposed by projection: interior mask P,
apply(X) = P A P X + park * (I - P) X, which parks the eliminated
directions at a harmless eigenvalue instead of slicing (static shapes).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def gather(X: jax.Array, elem_dofs: jax.Array) -> jax.Array:
    """(D, k) -> (E, 6, k)."""
    return X[elem_dofs]


def scatter_add(Ye: jax.Array, elem_dofs: jax.Array, n_dofs: int) -> jax.Array:
    """(E, 6, k) -> (D, k) summed."""
    E, six, k = Ye.shape
    return jax.ops.segment_sum(
        Ye.reshape(E * six, k), elem_dofs.reshape(E * six),
        num_segments=n_dofs)


def elem_matvec(blocks: jax.Array, Xe: jax.Array) -> jax.Array:
    """(E,6,6) @ (E,6,k) -> (E,6,k), MXU batched GEMM."""
    return jnp.einsum("eij,ejk->eik", blocks, Xe,
                      preferred_element_type=Xe.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def make_scalar_apply(blocks: jax.Array, elem_dofs: jax.Array, n_dofs: int,
                      mask: jax.Array | None = None,
                      park: float = 0.0) -> Callable:
    """Operator X -> P A P X + park (1-P) X for scalar 6x6 blocks."""

    def apply(X):
        Xm = X if mask is None else X * mask[:, None]
        Y = scatter_add(elem_matvec(blocks, gather(Xm, elem_dofs)),
                        elem_dofs, n_dofs)
        if mask is None:
            return Y
        return Y * mask[:, None] + park * (X - Xm)

    return apply


def make_vector_apply(Axx: jax.Array, Ayy: jax.Array, Axy: jax.Array,
                      elem_dofs: jax.Array, n_dofs: int,
                      mask: jax.Array | None = None,
                      park: float = 0.0) -> Callable:
    """Block-2x2 operator on stacked fields X of shape (2D, k).

    [Yx]   [Axx  Axy ] [Xx]
    [Yy] = [Axy' Ayy ] [Xy]     (A_yx = Axy^T per element => global too)
    """

    def apply(X):
        D = n_dofs
        Xx, Xy = X[:D], X[D:]
        if mask is not None:
            Xx = Xx * mask[:, None]
            Xy = Xy * mask[:, None]
        Gx = gather(Xx, elem_dofs)
        Gy = gather(Xy, elem_dofs)
        AxyT = jnp.swapaxes(Axy, 1, 2)
        Yx = scatter_add(elem_matvec(Axx, Gx) + elem_matvec(Axy, Gy),
                         elem_dofs, D)
        Yy = scatter_add(elem_matvec(AxyT, Gx) + elem_matvec(Ayy, Gy),
                         elem_dofs, D)
        Y = jnp.concatenate([Yx, Yy], axis=0)
        if mask is None:
            return Y
        mask2 = jnp.concatenate([mask, mask])[:, None]
        return Y * mask2 + park * X * (1.0 - mask2)

    return apply


def make_blockn_apply(blocks: Dict, n_components: int, elem_dofs: jax.Array,
                      n_dofs: int, mask: jax.Array | None = None,
                      park: float = 0.0) -> Callable:
    """General symmetric n-component block operator.

    ``blocks`` maps (ci, cj) with ci <= cj to (E, 6, 6) element blocks;
    the (cj, ci) block is the element-wise transpose. X has shape
    (n_components * D, k). Used for the fixed-beta 3-component H-field
    operator A(beta) (ops/assembly.py ``combine_vector3``).
    """

    def apply(X):
        D = n_dofs
        Xc = [X[c * D:(c + 1) * D] for c in range(n_components)]
        if mask is not None:
            Xm = [x * mask[:, None] for x in Xc]
        else:
            Xm = Xc
        G = [gather(x, elem_dofs) for x in Xm]
        Ye = [None] * n_components
        for (ci, cj), blk in blocks.items():
            contrib = elem_matvec(blk, G[cj])
            Ye[ci] = contrib if Ye[ci] is None else Ye[ci] + contrib
            if ci != cj:
                contrib_t = elem_matvec(jnp.swapaxes(blk, 1, 2), G[ci])
                Ye[cj] = contrib_t if Ye[cj] is None else Ye[cj] + contrib_t
        parts = []
        for c in range(n_components):
            Yc = scatter_add(Ye[c], elem_dofs, D)
            if mask is not None:
                Yc = Yc * mask[:, None] + park * (Xc[c] - Xm[c])
            parts.append(Yc)
        return jnp.concatenate(parts, axis=0)

    return apply


def stack_blocks(blocks: Dict, n_components: int) -> jax.Array:
    """Fuse symmetric component blocks into one (E, 6C, 6C) tensor.

    ``blocks`` maps (ci, cj) with ci <= cj to (E, 6, 6); missing (cj, ci)
    is the element-wise transpose. The fused tensor turns a C-component
    operator apply into ONE batched (6C x 6C) GEMM — bigger MXU tiles and
    a single gather/scatter per apply instead of one per block.
    """
    some = next(iter(blocks.values()))
    E = some.shape[0]
    zero = jnp.zeros_like(some)
    rows = []
    for ci in range(n_components):
        cols = []
        for cj in range(n_components):
            if (ci, cj) in blocks:
                b = blocks[(ci, cj)]
            elif (cj, ci) in blocks:
                b = jnp.swapaxes(blocks[(cj, ci)], 1, 2)
            else:
                b = zero
            cols.append(b)
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def stacked_elem_dofs(elem_dofs: jax.Array, n_dofs: int,
                      n_components: int) -> jax.Array:
    """(E, 6) -> (E, 6C) global ids into the stacked (C*D,) vector."""
    return jnp.concatenate(
        [elem_dofs + c * n_dofs for c in range(n_components)], axis=1)


def make_stacked_apply(big_blocks: jax.Array, elem_dofs: jax.Array,
                       n_dofs: int, n_components: int,
                       mask: jax.Array | None = None,
                       park: float = 0.0) -> Callable:
    """C-component operator as one fused batched GEMM.

    X has shape (C*D, k); the apply is gather -> (E,6C,6C)@(E,6C,k) ->
    segment-sum, with Dirichlet/pad projection P A P + park (I - P).
    """
    ed3 = stacked_elem_dofs(elem_dofs, n_dofs, n_components)
    C = n_components

    def apply(X):
        D = n_dofs
        if mask is not None:
            maskC = jnp.tile(mask, C)[:, None]
            Xm = X * maskC
        else:
            Xm = X
        G = Xm[ed3]                                  # (E, 6C, k)
        Ye = jnp.einsum("eij,ejk->eik", big_blocks, G,
                        preferred_element_type=G.dtype,
                        precision=jax.lax.Precision.HIGHEST)
        Y = jax.ops.segment_sum(
            Ye.reshape(-1, Ye.shape[-1]), ed3.reshape(-1),
            num_segments=C * D)
        if mask is None:
            return Y
        return Y * maskC + park * (X - Xm)

    return apply


def make_block_diag_apply(blocks: jax.Array, elem_dofs: jax.Array,
                          n_dofs: int, n_components: int = 2,
                          mask: jax.Array | None = None,
                          park: float = 1.0) -> Callable:
    """Same 6x6 blocks applied independently to each field component.

    Used for B = diag(M_1/eps, M_1/eps) (solver_fem.py:165-167) and plain
    mass inner products. ``park`` defaults to 1 so that parked directions
    get pencil eigenvalue park_A / park_B.
    """

    def apply(X):
        D = n_dofs
        parts = []
        for c in range(n_components):
            Xc = X[c * D:(c + 1) * D]
            Xm = Xc if mask is None else Xc * mask[:, None]
            Yc = scatter_add(elem_matvec(blocks, gather(Xm, elem_dofs)),
                             elem_dofs, D)
            if mask is not None:
                Yc = Yc * mask[:, None] + park * (Xc - Xm)
            parts.append(Yc)
        return jnp.concatenate(parts, axis=0)

    return apply


def block_diagonal(blocks: jax.Array, elem_dofs: jax.Array,
                   n_dofs: int) -> jax.Array:
    """Diagonal of the assembled operator (for Jacobi scaling)."""
    diag_e = jnp.diagonal(blocks, axis1=1, axis2=2)  # (E, 6)
    return jax.ops.segment_sum(diag_e.reshape(-1), elem_dofs.reshape(-1),
                               num_segments=n_dofs)


def quadratic_form(apply_fn: Callable, X: jax.Array, Y: jax.Array | None = None):
    """X^T (A Y) with Y defaulting to X; returns (k, k)."""
    Y = X if Y is None else Y
    return X.T @ apply_fn(Y)
