"""Scalar Helmholtz eigenmode solver.

Pencil (K - k0^2 M_eps) psi = lambda M psi with lambda = -beta^2
(/root/reference/solver_fem.py:245-276). Guided modes are the *smallest*
eigenvalues of the pencil (lambda in [-k0^2 eps_core, -k0^2 eps_clad)),
so the TPU backend needs no shift-invert at all:

- device (float32): low-end Chebyshev subspace filter over matrix-free
  element-block operators (ops/kernels.py, compiled once per bucket);
- host (float64): exact CSR Rayleigh-Ritz polish (ops/host_assembly.py)
  for final eigenvalue accuracy — a few SpMV, no factorization.

The hybrid backend runs the reference-identical scipy ``eigsh``
shift-invert on the host CSR (solver_fem.py:260-261) — parity oracle
and CPU fallback.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimulationConfig
from ..ops.assembly import (
    GridArrays,
    assemble_scalar_system,
    eps_arrays,
    gather_scatter,
    grid_to_device,
)
from ..ops.eig import scipy_eigsh_pencil
from ..ops.femgrid import DeviceGrid, FEMGrid, MeshGenerator, export_device_grid
from ..ops.host_assembly import HostScalarPencil, build_host_scalar
from ..ops.kernels import solve_lowest_kernel
from .postproc import confinement_from_dofs, in_core_mask

logger = logging.getLogger("pl_fem_tpu.solvers.scalar")


@dataclasses.dataclass(frozen=True)
class ScalarPencil:
    """Assembled scalar pencil: f32 element blocks on device."""

    ga: GridArrays
    A_blocks: jax.Array       # (E,6,6) K - k0^2 M_eps  (float32)
    B_blocks: jax.Array       # (E,6,6) mass
    diag_B: jax.Array         # (D,) float32 assembled mass diagonal
    n_dofs: int               # valid DOF count
    k0: float


def _as_device_grid(grid, config: SimulationConfig) -> DeviceGrid:
    if isinstance(grid, DeviceGrid):
        return grid
    if isinstance(grid, FEMGrid):
        return export_device_grid(grid, config.mesh.bucket_rounding)
    raise TypeError(f"expected FEMGrid or DeviceGrid, got {type(grid)}")


def build_scalar_pencil(dg: DeviceGrid, eps_params, k0: float) -> ScalarPencil:
    """Assemble the scalar pencil element blocks on device (one jit call)."""
    ga = grid_to_device(dg, dtype=jnp.float32)
    A, B, diag = assemble_scalar_system(
        ga, eps_arrays(eps_params, dtype=jnp.float32), jnp.float32(k0))
    return ScalarPencil(ga=ga, A_blocks=A, B_blocks=B, diag_B=diag,
                        n_dofs=dg.n_dofs, k0=k0)


class ScalarHelmholtzSolver:
    """Scalar Helmholtz solver (reference seam: solver_fem.py:245-276).

    ``solve`` accepts a host FEMGrid or exported DeviceGrid (or None to
    mesh the geometry) and returns the reference mode-dict schema:
    n_eff, beta, field_vector, confinement, core_overlap, PDL_dB=0,
    polarization='scalar', is_vectorial=False.
    """

    def __init__(self, geometry, config: Optional[SimulationConfig] = None):
        self.geometry = geometry
        self.k0 = float(geometry.k0)
        self.config = config or SimulationConfig()

    # -- public API ----------------------------------------------------------
    def solve(self, grid=None, n_modes_target: int = 20,
              mode_filter: str = "none") -> List[Dict]:
        """Solve for guided modes.

        ``mode_filter='cascade'`` applies the reference CLI's guided-mode
        selection (main.py:209-288): quadrature-exact loose/strict core
        masses give confinement and core_overlap, then the threshold
        cascade 0.85 -> 0.70 -> 0.50 -> 0.30 -> unfiltered with
        OVERLAP_MIN 0.80 and a top-3N cap. Default 'none' matches the
        library-path ScalarHelmholtzSolver (solver_fem.py:245-276).
        """
        cfg = self.config
        if grid is None:
            grid = MeshGenerator.generate(self.geometry,
                                          cfg.mesh.refinement, cfg)
        dg = _as_device_grid(grid, cfg)
        if cfg.solver.backend not in ("tpu", "hybrid"):
            raise ValueError(f"unknown solver backend "
                             f"{cfg.solver.backend!r}; use 'tpu' or 'hybrid'")
        host = build_host_scalar(dg, self.geometry.eps_params(), self.k0)
        if cfg.solver.backend == "hybrid":
            lam, V = self._solve_hybrid(host, dg, n_modes_target)
        else:
            lam, V = self._solve_tpu(host, dg, n_modes_target)
        modes = self._modes_from_eigenpairs(host, dg, lam, V, n_modes_target)
        if mode_filter == "cascade":
            modes = self._cascade_filter(modes, dg, host)
        return modes

    # -- guided-mode cascade (main.py:205-288) -------------------------------
    def _cascade_filter(self, modes: List[Dict], dg: DeviceGrid,
                        host: HostScalarPencil) -> List[Dict]:
        from ..ops.host_assembly import _wsum_np, scalar_pattern, _flat

        if not modes:
            return modes
        g = self.geometry
        x = dg.qp_xy[..., 0]
        y = dg.qp_xy[..., 1]
        pos = np.asarray(g.positions)
        rad = np.asarray(g.core_radii)
        Nq = np.broadcast_to(dg.shape_vals[None], dg.qp_w.shape + (6,))
        spat = scalar_pattern(dg)

        def core_mass(factor):
            d2 = ((x[..., None] - pos[:, 0]) ** 2
                  + (y[..., None] - pos[:, 1]) ** 2)
            w = np.any(d2 <= (factor * rad) ** 2, axis=-1).astype(float)
            return spat.with_blocks(
                _flat(_wsum_np(dg.qp_w, w, Nq, Nq), dg.n_elems))

        Ml = core_mass(1.10)     # loose -> confinement (main.py:209-214)
        Ms = core_mass(1.00)     # strict -> core_overlap (main.py:217-222)
        for m in modes:
            v = m["field_vector"]
            denom = float(v @ (host.B @ v)) + 1e-20
            m["confinement"] = float(np.clip(v @ (Ml @ v) / denom, 0.0, 1.0))
            m["core_overlap"] = float(np.clip(v @ (Ms @ v) / denom, 0.0, 1.0))

        # threshold cascade (main.py:258-288)
        N = g.n_cores
        OVERLAP_MIN = 0.80

        def ok(m, thr):
            return (m["confinement"] >= thr
                    and m["core_overlap"] >= OVERLAP_MIN)

        kept = [m for m in modes if ok(m, 0.85)]
        if len(kept) < N:
            for thr in (0.70, 0.50, 0.30):
                alt = [m for m in modes if ok(m, thr)]
                if len(alt) >= N:
                    kept = alt
                    logger.warning("confinement threshold relaxed to %.2f "
                                   "(%d modes)", thr, len(alt))
                    break
            else:
                kept = sorted(modes, key=lambda m: m["confinement"],
                              reverse=True)
                logger.warning("overlap filter disabled (last resort)")
        kept.sort(key=lambda m: m["confinement"], reverse=True)
        kept = kept[: 3 * N]
        kept.sort(key=lambda m: m["n_eff"], reverse=True)
        return kept

    # -- backends ------------------------------------------------------------
    def _solve_tpu(self, host: HostScalarPencil, dg: DeviceGrid,
                   n_modes_target: int):
        scfg = self.config.solver
        g = self.geometry
        pencil = build_scalar_pencil(dg, g.eps_params(), self.k0)
        ga = pencil.ga
        D = dg.n_dofs_padded
        n = dg.n_dofs
        k = min(n_modes_target + scfg.extra_vectors, max(n - 4, 1))
        window = self.k0**2 * max(g.n_core**2 - g.n_clad**2, 1e-6)
        cut = -(self.k0 * g.n_clad) ** 2 + 0.02 * window

        X0 = jax.random.normal(jax.random.PRNGKey(42), (D, k),
                               dtype=jnp.float32)
        theta, X, res = solve_lowest_kernel(
            pencil.A_blocks, pencil.B_blocks, gather_scatter(ga),
            ga.dof_valid, pencil.diag_B, X0, cut, ga.elem_valid, C=1,
            degree=scfg.cheb_degree, passes=scfg.cheb_passes,
            tol=scfg.scalar_tol, park=1.0, n_wanted=k)

        # float64 host polish on the filtered subspace
        Xh = np.asarray(X, dtype=np.float64)[:n]
        lam, V, _ = host.rr(Xh)
        Vp = np.zeros((D, V.shape[1]))
        Vp[:n] = V
        return lam, Vp

    def _solve_hybrid(self, host: HostScalarPencil, dg: DeviceGrid,
                      n_modes_target: int):
        n = dg.n_dofs
        sigma = -(self.k0 * (self.geometry.n_core - 0.008)) ** 2
        k = min(n_modes_target + 8, n - 4)
        lam, V = scipy_eigsh_pencil(host.A, host.B, k=k, sigma=sigma,
                                    tol=1e-6, maxiter=6000)
        Vp = np.zeros((dg.n_dofs_padded, V.shape[1]))
        Vp[:n] = V
        return lam, Vp

    # -- post-processing -----------------------------------------------------
    def _modes_from_eigenpairs(self, host: HostScalarPencil, dg: DeviceGrid,
                               lam: np.ndarray, V: np.ndarray,
                               n_modes_target: int) -> List[Dict]:
        g = self.geometry
        n = dg.n_dofs
        order = np.argsort(lam)
        lam = lam[order]
        V = V[:, order]

        # guided window (solver_fem.py:266-268)
        neg = lam < 0
        ne = np.sqrt(np.maximum(-lam, 0.0)) / self.k0
        keep = neg & (ne > g.n_clad) & (ne < g.n_core * 1.005)
        if not np.any(keep):
            return []
        lam, ne, V = lam[keep], ne[keep], V[:, keep]

        # M-normalize (solver_fem.py:269)
        Vn = V[:n]
        MV = host.B @ Vn
        nrm = np.sqrt(np.maximum(np.sum(Vn * MV, axis=0), 1e-300))
        Vn = Vn / nrm

        core = np.asarray(in_core_mask(
            jnp.asarray(dg.dof_coords[:n]), g.positions, g.core_radii))
        conf = np.asarray(confinement_from_dofs(jnp.asarray(Vn**2),
                                                jnp.asarray(core)))

        modes: List[Dict] = []
        for i in range(Vn.shape[1]):
            modes.append({
                "n_eff": float(ne[i]),
                "beta": float(self.k0 * ne[i]),
                "field_vector": np.asarray(Vn[:, i]),
                "confinement": float(conf[i]),
                "core_overlap": float(conf[i]),
                "PDL_dB": 0.0,
                "polarization": "scalar",
                "is_vectorial": False,
            })
        modes.sort(key=lambda m: m["n_eff"], reverse=True)
        return modes[: max(3 * n_modes_target, n_modes_target)]
