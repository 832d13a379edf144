"""Device-side FEM assembly: fused per-element quadrature -> dense blocks.

All bilinear forms of the scalar Helmholtz and vectorial H-field systems
(the nine forms of /root/reference/solver_fem.py:131-150 plus the core
masks of main.py:209-226) are evaluated in ONE vmapped quadrature pass per
family — they share the geometry factors and the permittivity at the
quadrature points. The result is per-element 6x6 blocks which feed either
the matrix-free kernels (ops/kernels.py, the TPU path) or a host CSR
export (oracle / hybrid path, ops/host_assembly.py).

Matrix convention: blocks[e, i, j] couples test function i with trial
function j of element e; global A[I, J] = sum_e blocks[e, i, j] over the
(I=dof(e,i), J=dof(e,j)) scatter.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.geometry import EpsParams
from .femgrid import DeviceGrid


class GridArrays(NamedTuple):
    """Device-resident subset of DeviceGrid used by assembly/operators."""

    elem_dofs: jax.Array    # (E, 6) int32
    elem_valid: jax.Array   # (E,) bool
    dof_gather_v: jax.Array  # (split, Wv) int32 transpose-gather table
    dof_gather_valid_v: jax.Array  # (split, Wv) bool
    dof_gather_e: jax.Array  # (D - split, 2) int32 (edge-midpoint DOFs)
    dof_gather_valid_e: jax.Array  # (D - split, 2) bool
    inv_jt: jax.Array       # (E, 2, 2) J^{-T}
    qp_xy: jax.Array        # (E, Q, 2)
    qp_w: jax.Array         # (E, Q)
    grad_phys: jax.Array    # (E, Q, 6, 2)
    shape_vals: jax.Array   # (Q, 6)
    dof_coords: jax.Array   # (D, 2)
    interior_mask: jax.Array  # (D,) float (1 interior, 0 boundary/pad)
    dof_valid: jax.Array    # (D,) float


def grid_to_device(dg: DeviceGrid, dtype=jnp.float32) -> GridArrays:
    """Ship a DeviceGrid's arrays to the default device.

    Guard (CLAUDE.md gotcha): f64 jit graphs hang the axon TPU compiler
    for minutes, so 64-bit dtypes are refused when the default backend
    is a TPU. Host-precision math lives in ops/host_assembly.py.
    """
    if jnp.dtype(dtype).itemsize >= 8 and \
            jax.default_backend() == "tpu":
        raise ValueError(
            "grid_to_device(dtype=float64) on a TPU backend is forbidden: "
            "f64 jit graphs wedge the TPU compiler. Use float32 on device "
            "and the host f64 polish (ops/host_assembly.py) for precision.")
    return GridArrays(
        elem_dofs=jnp.asarray(dg.elem_dofs, dtype=jnp.int32),
        elem_valid=jnp.asarray(dg.elem_valid, dtype=bool),
        dof_gather_v=jnp.asarray(dg.dof_gather_v, dtype=jnp.int32),
        dof_gather_valid_v=jnp.asarray(dg.dof_gather_valid_v, dtype=bool),
        dof_gather_e=jnp.asarray(dg.dof_gather_e, dtype=jnp.int32),
        dof_gather_valid_e=jnp.asarray(dg.dof_gather_valid_e, dtype=bool),
        inv_jt=jnp.asarray(dg.inv_jt, dtype=dtype),
        qp_xy=jnp.asarray(dg.qp_xy, dtype=dtype),
        qp_w=jnp.asarray(dg.qp_w, dtype=dtype),
        grad_phys=jnp.asarray(dg.grad_phys, dtype=dtype),
        shape_vals=jnp.asarray(dg.shape_vals, dtype=dtype),
        dof_coords=jnp.asarray(dg.dof_coords, dtype=dtype),
        interior_mask=jnp.asarray(dg.interior_mask, dtype=dtype),
        dof_valid=jnp.asarray(dg.dof_valid, dtype=dtype),
    )


class EpsArrays(NamedTuple):
    """Traceable permittivity parameters (jit-argument form of EpsParams).

    ``pml_start <= 0`` disables the PML branchlessly, so one compiled
    executable covers both cases per core count.
    """

    positions: jax.Array     # (N, 2)
    core_radii: jax.Array    # (N,)
    eps_core: jax.Array      # scalar
    eps_clad: jax.Array
    pml_start: jax.Array
    pml_thickness: jax.Array
    pml_strength: jax.Array
    pml_order: jax.Array


def gather_scatter(ga: GridArrays):
    """GatherScatter topology bundle for the matrix-free kernels."""
    from .kernels import GatherScatter

    return GatherScatter(elem_dofs=ga.elem_dofs, idx_v=ga.dof_gather_v,
                         valid_v=ga.dof_gather_valid_v,
                         idx_e=ga.dof_gather_e,
                         valid_e=ga.dof_gather_valid_e)


def eps_arrays(p: EpsParams, dtype=jnp.float64) -> EpsArrays:
    return EpsArrays(
        positions=jnp.asarray(p.positions, dtype=dtype),
        core_radii=jnp.asarray(p.core_radii, dtype=dtype),
        eps_core=jnp.asarray(p.eps_core, dtype=dtype),
        eps_clad=jnp.asarray(p.eps_clad, dtype=dtype),
        pml_start=jnp.asarray(p.pml_start, dtype=dtype),
        pml_thickness=jnp.asarray(p.pml_thickness, dtype=dtype),
        pml_strength=jnp.asarray(p.pml_strength, dtype=dtype),
        pml_order=jnp.asarray(float(p.pml_order), dtype=dtype),
    )


def points_in_cores(x, y, positions, radii, factor=1.0):
    """Vectorized any-core membership test (traceable)."""
    positions = jnp.asarray(positions)
    radii = jnp.asarray(radii)
    d2 = ((x[..., None] - positions[:, 0]) ** 2
          + (y[..., None] - positions[:, 1]) ** 2)
    return jnp.any(d2 <= (factor * radii) ** 2, axis=-1)


def eps_at_quadrature(ga: GridArrays, eps):
    """Relative permittivity (re, im) at every quadrature point.

    Same piecewise-constant + annular-PML model as the geometry layer
    (models/geometry.py ``epsilon_at``), evaluated on device so one grid
    serves any (eps, k0). ``eps`` may be EpsParams (host) or EpsArrays
    (traced).
    """
    x = ga.qp_xy[..., 0]
    y = ga.qp_xy[..., 1]
    in_core = points_in_cores(x, y, eps.positions, eps.core_radii)
    eps_re = jnp.where(in_core, eps.eps_core, eps.eps_clad)
    rho = jnp.clip((jnp.sqrt(x * x + y * y) - eps.pml_start)
                   / jnp.maximum(eps.pml_thickness, 1e-30), 0.0, 1.0)
    sigma = jnp.where((eps.pml_thickness > 0.0) & (eps.pml_start > 0.0),
                      eps.pml_strength * rho ** eps.pml_order, 0.0)
    eps_im = eps_re * sigma
    return eps_re, eps_im


def _wsum(ga: GridArrays, coeff, a, b):
    """sum_q coeff[e,q] * a[e,q,i] * b[e,q,j] with quadrature weights."""
    return jnp.einsum("eq,eqi,eqj->eij", ga.qp_w * coeff, a, b)


def scalar_blocks(ga: GridArrays, eps_re) -> Dict[str, jax.Array]:
    """Scalar Helmholtz element blocks: K (stiffness), M (mass), Me (eps mass).

    Operator pencil: (K - k0^2 Me) psi = lambda M psi with lambda = -beta^2
    (ScalarHelmholtzSolver formulation, solver_fem.py:252-261).
    """
    gx = ga.grad_phys[..., 0]
    gy = ga.grad_phys[..., 1]
    Nq = jnp.broadcast_to(ga.shape_vals[None], ga.qp_w.shape + (6,))
    one = jnp.ones_like(eps_re)
    return {
        "K": _wsum(ga, one, gx, gx) + _wsum(ga, one, gy, gy),
        "M": _wsum(ga, one, Nq, Nq),
        "Me": _wsum(ga, eps_re, Nq, Nq),
    }


def vector_blocks(ga: GridArrays, eps_re, k0: float,
                  alpha_p: float = 1.0) -> Dict[str, jax.Array]:
    """Vectorial H-field element blocks (Rahman-Davies + div penalty).

    Pencil: A ht = beta^2 B ht over ht = (Hx, Hy), with
      A = [[Kxx + a Dxx - k0^2 M,  Kxy + a Dxy ],
           [(Kxy + a Dxy)^T,       Kyy + a Dyy - k0^2 M]]
      B = diag(M_{1/eps}, M_{1/eps})
    where Kxx = (1/eps) dy.dy, Kyy = (1/eps) dx.dx, Kxy = -(1/eps) dx_i dy_j
    etc. (nine forms of solver_fem.py:131-150, fused in one pass; only
    Re(eps) enters, matching solver_fem.py:132).

    Returns blocks: Axx, Ayy, Axy (A_yx = Axy^T), Binv (=M_{1/eps}),
    Dxx, Dyy, Dxy (for divergence-energy diagnostics), M (plain mass).
    """
    gx = ga.grad_phys[..., 0]
    gy = ga.grad_phys[..., 1]
    Nq = jnp.broadcast_to(ga.shape_vals[None], ga.qp_w.shape + (6,))
    inv_eps = 1.0 / eps_re
    one = jnp.ones_like(eps_re)

    Kxx = _wsum(ga, inv_eps, gy, gy)
    Kyy = _wsum(ga, inv_eps, gx, gx)
    Kxy = -_wsum(ga, inv_eps, gx, gy)   # [i,j] = -(1/eps) dx_i dy_j
    Dxx = _wsum(ga, one, gx, gx)
    Dyy = _wsum(ga, one, gy, gy)
    Dxy = _wsum(ga, one, gy, gx)        # [i,j] = dy_i dx_j  (test_y trial_x)
    M = _wsum(ga, one, Nq, Nq)
    Binv = _wsum(ga, inv_eps, Nq, Nq)

    k2 = k0 * k0
    return {
        "Axx": Kxx + alpha_p * Dxx - k2 * M,
        "Ayy": Kyy + alpha_p * Dyy - k2 * M,
        "Axy": Kxy + alpha_p * Dxy,
        "Binv": Binv,
        "Dxx": Dxx,
        "Dyy": Dyy,
        "Dxy": Dxy,
        "M": M,
    }


def vector3_primitives(ga: GridArrays, eps_re) -> Dict[str, jax.Array]:
    """Quadrature primitives for the fixed-beta 3-component H formulation.

    TPU-first reformulation (no analog in the reference): instead of the
    fixed-k0 transverse pencil A ht = beta^2 B ht — whose guided modes are
    *interior* eigenvalues, forcing ARPACK shift-invert + sparse LU
    (solver_fem.py:196-197) — we solve the full-vector curl-curl problem
    at fixed propagation constant beta,

        A(beta) h = k0^2 M h,   h = (hx, hy, hz~),  H = (hx, hy, i hz~) e^{i beta z}

    with A(beta) = A0 + beta A1 + beta^2 A2 (all real symmetric):

        a(h, h') = int (1/eps) [ (dy hz~ - b hy)(.) + (b hx - dx hz~)(.)
                                 + (dx hy - dy hx)(.) ]
                 + alpha_p int (dx hx + dy hy - b hz~)(.)

    Guided modes are then the SMALLEST eigenvalues below the radiation
    edge k0^2 = beta^2/eps_clad, and with alpha_p = 1 every zero-curl
    spurious field h = (grad phi, beta phi) has k0^2 = alpha_p (q^2 +
    beta^2) >= beta^2 — at or above the edge. Extremal eigenvalues admit
    cheap low-end Chebyshev filtering; no factorization anywhere.

    Returns the six weighted primitives from which A0/A1/A2 are combined
    per traced beta: {w}{pair} with w in (i=1/eps, u=1) and pair in
    (gxgx, gygy, gxgy, nn, ngx, ngy); pair [i, j] = test_i * trial_j.
    """
    gx = ga.grad_phys[..., 0]
    gy = ga.grad_phys[..., 1]
    Nq = jnp.broadcast_to(ga.shape_vals[None], ga.qp_w.shape + (6,))
    inv_eps = 1.0 / eps_re
    one = jnp.ones_like(eps_re)
    out = {}
    for wname, w in (("i", inv_eps), ("u", one)):
        out[wname + "_gxgx"] = _wsum(ga, w, gx, gx)
        out[wname + "_gygy"] = _wsum(ga, w, gy, gy)
        out[wname + "_gxgy"] = _wsum(ga, w, gx, gy)
        out[wname + "_nn"] = _wsum(ga, w, Nq, Nq)
        out[wname + "_ngx"] = _wsum(ga, w, Nq, gx)
        out[wname + "_ngy"] = _wsum(ga, w, Nq, gy)
    return out


def combine_vector3(prim: Dict[str, jax.Array], beta, alpha_p: float = 1.0,
                    derivative: bool = False) -> Dict:
    """Combine primitives into the 3x3 component blocks of A(beta).

    Components ordered (0=x, 1=y, 2=z~). Only the upper triangle is
    returned; block (j, i) is the element-wise transpose of (i, j) (the
    global operator is symmetric). With ``derivative`` the blocks of
    dA/dbeta = A1 + 2 beta A2 are returned instead (Hellmann-Feynman
    slope for the dispersion Newton/Hermite steps).

    Expansion of the form (test v, trial u; entries [i=test, j=trial]):
      curl_x: (1/e)[dyuz dyvz - b(dyuz vy + uy dyvz) + b^2 uy vy]
      curl_y: (1/e)[dxuz dxvz - b(dxuz vx + ux dxvz) + b^2 ux vx]
      curl_z: (1/e)[dxuy dxvy - dxuy dyvx - dyux dxvy + dyux dyvx]
      pen   : ap [divt_u divt_v - b(divt_u vz + uz divt_v) + b^2 uz vz]
    """
    ap = alpha_p
    T = lambda M: jnp.swapaxes(M, 1, 2)  # noqa: E731

    if not derivative:
        c0, c1, c2 = 1.0, beta, beta * beta
    else:
        c0, c1, c2 = 0.0, 1.0, 2.0 * beta

    return {
        # (x,x): curl_z dyux dyvx -> i_gygy ; pen dxux dxvx -> ap u_gxgx ;
        #        curl_y b^2 ux vx -> i_nn
        (0, 0): c0 * (prim["i_gygy"] + ap * prim["u_gxgx"]) + c2 * prim["i_nn"],
        # (y,y): curl_z dxuy dxvy ; pen dyuy dyvy ; curl_x b^2 uy vy
        (1, 1): c0 * (prim["i_gxgx"] + ap * prim["u_gygy"]) + c2 * prim["i_nn"],
        # (z,z): (1/e)(dxuz dxvz + dyuz dyvz) ; pen b^2 uz vz
        (2, 2): c0 * (prim["i_gxgx"] + prim["i_gygy"]) + c2 * ap * prim["u_nn"],
        # (x,y): curl_z -dxuy dyvx -> -(1/e) gy_i gx_j = -T(i_gxgy) ;
        #        pen dyuy dxvx -> ap gx_i gy_j = ap u_gxgy
        (0, 1): c0 * (-T(prim["i_gxgy"]) + ap * prim["u_gxgy"]),
        # (x,z): curl_y -b dxuz vx -> -(1/e) N_i gx_j = -i_ngx ;
        #        pen -b uz dxvv.. -> -ap gx_i N_j = -ap T(u_ngx)
        (0, 2): c1 * (-prim["i_ngx"] - ap * T(prim["u_ngx"])),
        # (y,z): curl_x -b dyuz vy -> -i_ngy ; pen -ap gy_i N_j
        (1, 2): c1 * (-prim["i_ngy"] - ap * T(prim["u_ngy"])),
    }


def core_mask_blocks(ga: GridArrays, positions, radii,
                     factor: float = 1.0) -> jax.Array:
    """Mass blocks restricted to the core disks scaled by ``factor``.

    Quadrature-exact core-overlap masses (confinement uses factor=1.10,
    core_overlap factor=1.0 — main.py:209-226 semantics).
    """
    x = ga.qp_xy[..., 0]
    y = ga.qp_xy[..., 1]
    in_core = points_in_cores(x, y, positions, radii, factor)
    Nq = jnp.broadcast_to(ga.shape_vals[None], ga.qp_w.shape + (6,))
    return _wsum(ga, in_core.astype(ga.qp_w.dtype), Nq, Nq)


def im_eps_mass_blocks(ga: GridArrays, eps_im) -> jax.Array:
    """Mass blocks weighted by Im(eps) — first-order PML perturbation.

    Im(beta^2) ~ -k0^2 <psi|Im(eps)|psi> gives the radiation damping the
    reference only exploits through complex epsilon in its scalar CLI path
    (main.py:108-122); here it is a cheap post-processing perturbation.
    """
    Nq = jnp.broadcast_to(ga.shape_vals[None], ga.qp_w.shape + (6,))
    return _wsum(ga, eps_im, Nq, Nq)


# ============================================================================
# Jitted assembly entry points (compiled once per mesh bucket / n_cores)
# ============================================================================

@jax.jit
def assemble_scalar_system(ga: GridArrays, ea: EpsArrays, k0):
    """(A, B, diag_B32) element blocks of the scalar Helmholtz pencil."""
    eps_re, _ = eps_at_quadrature(ga, ea)
    blk = scalar_blocks(ga, eps_re)
    A = blk["K"] - (k0 * k0) * blk["Me"]
    B = blk["M"]
    diag_e = jnp.diagonal(B.astype(jnp.float32), axis1=1, axis2=2)
    diag = jax.ops.segment_sum(diag_e.reshape(-1),
                               ga.elem_dofs.reshape(-1),
                               num_segments=ga.dof_valid.shape[0])
    diag = jnp.where(ga.dof_valid > 0, diag, 1.0)
    return A, B, diag


@jax.jit
def assemble_vector3_system(ga: GridArrays, ea: EpsArrays):
    """Quadrature primitives + mass diagonal for the fixed-beta operator."""
    eps_re, eps_im = eps_at_quadrature(ga, ea)
    prim = vector3_primitives(ga, eps_re)
    Mb = prim["u_nn"]
    diag_e = jnp.diagonal(Mb.astype(jnp.float32), axis1=1, axis2=2)
    diag = jax.ops.segment_sum(diag_e.reshape(-1),
                               ga.elem_dofs.reshape(-1),
                               num_segments=ga.dof_valid.shape[0])
    diag = jnp.where(ga.interior_mask > 0, diag, 1.0)
    return prim, diag, eps_im


@jax.jit
def assemble_vector3_qf(ga: GridArrays, ea: EpsArrays):
    """Quadrature factors + mass diagonal for the matrix-free path."""
    from .kernels import QFactor, _N_REF

    eps_re, _ = eps_at_quadrature(ga, ea)
    qf = QFactor(invJT=ga.inv_jt.astype(jnp.float32),
                 w=ga.qp_w.astype(jnp.float32),
                 inv_eps=(1.0 / eps_re).astype(jnp.float32))
    from .kernels import _accumulate

    diag_e = jnp.einsum("eq,qi->ei", qf.w, _N_REF**2)
    diag = _accumulate(diag_e[:, :, None], gather_scatter(ga), 1)[:, 0]
    diag = jnp.where(ga.interior_mask > 0, diag, 1.0)
    return qf, diag


def stack_blocks(blocks: Dict, n_components: int) -> jax.Array:
    """Fuse symmetric component blocks into one (E, 6C, 6C) tensor.

    ``blocks`` maps (ci, cj) with ci <= cj to (E, 6, 6); missing (cj, ci)
    is the element-wise transpose."""
    some = next(iter(blocks.values()))
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


@jax.jit
def vector3_stacked_A(prim, beta, alpha_p):
    """Stacked (E, 18, 18) operator A(beta) from primitives (traced beta)."""
    return stack_blocks(combine_vector3(prim, beta, alpha_p), 3)


# ============================================================================
# Host CSR export (oracle / hybrid backend)
# ============================================================================

def blocks_to_csr(blocks: np.ndarray, elem_dofs: np.ndarray, n_dofs: int):
    """Scatter per-element blocks into a scipy CSR matrix (host)."""
    import scipy.sparse as sp

    blocks = np.asarray(blocks)
    elem_dofs = np.asarray(elem_dofs)
    E = blocks.shape[0]
    rows = np.repeat(elem_dofs[:, :, None], 6, axis=2)
    cols = np.repeat(elem_dofs[:, None, :], 6, axis=1)
    m = sp.coo_matrix(
        (blocks.reshape(-1), (rows.reshape(-1), cols.reshape(-1))),
        shape=(n_dofs, n_dofs))
    return m.tocsr()
