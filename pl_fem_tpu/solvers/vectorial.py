"""Vectorial H-field Maxwell eigenmode solver.

Capability parity with /root/reference/solver_fem.py:113-239 (Rahman &
Davies transverse H-field pencil A ht = beta^2 B ht with divergence
penalty alpha_p = 1, Dirichlet boundary, LP01 sigma estimate, div-ratio
and radiation filters, polarization classification) — two backends:

- 'hybrid': host f64 CSR of the reference's transverse 2N x 2N pencil
  -> scipy ``eigsh`` shift-invert on the interior slice. Numerically
  the reference algorithm (including its penalty-spurious weaknesses).

- 'tpu' (default): a factorization-free reformulation. The transverse
  pencil's guided modes are *interior* eigenvalues (the reason the
  reference needs ARPACK + SuperLU). Instead we solve the full-vector
  curl-curl problem at *fixed propagation constant* beta0,

      A(beta0) h = k0^2 M h,    h = (hx, hy, hz~),

  where guided modes are the SMALLEST eigenvalues — reachable with a
  float32 low-end Chebyshev filter over matrix-free element-block
  operators on the device (ops/kernels.py). The filtered subspace V
  then turns "given k0, find beta" into a small projected quadratic
  eigenproblem

      (A0 + beta A1 + beta^2 A2 - k0^2 M) y = 0,

  solved on the host in float64 by companion linearization over shared-
  pattern CSRs (ops/host_assembly.py). A second pass re-filters at the
  recovered median beta to tighten the subspace.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimulationConfig
from ..ops.assembly import (
    assemble_vector3_qf,
    assemble_vector3_system,
    eps_arrays,
    gather_scatter,
    grid_to_device,
    vector3_stacked_A,
)
from ..ops.eig import scipy_eigsh_pencil
from ..ops.femgrid import DeviceGrid, FEMGrid, MeshGenerator, export_device_grid
from ..ops.host_assembly import (
    HostVector3,
    build_host_vector3,
    build_host_vector3_family,
    eps_at_quadrature_np,
    quadratic_subspace,
    scalar_pattern,
    vector3_prims_np,
)
from ..ops.kernels import QFactorSweep, solve_lowest_sweep
from .postproc import polarization_from_powers, polarization_label

logger = logging.getLogger("pl_fem_tpu.solvers.vectorial")


def lp01_neff_estimate(k0: float, r_mean: float, n_core: float,
                       n_clad: float) -> float:
    """LP01 effective-index estimate (solver_fem.py:187-193).

    The reference clips to [n_clad + 0.05, n_core - 0.005]; for low
    contrast (delta_n < 0.055) that window is empty and numpy's clip
    degenerates to the upper bound, ruining a perfectly good estimate —
    shrink the lower clip so the window stays valid (the reference never
    hits this regime: its claddings are air).
    """
    NA = np.sqrt(max(n_core**2 - n_clad**2, 1e-6))
    V_geom = k0 * r_mean * NA
    b_approx = max((1.0 - 2.405 / max(V_geom, 2.41)) ** 2, 0.05)
    n_eff_est = np.sqrt(n_clad**2 + b_approx * (n_core**2 - n_clad**2))
    hi = n_core - 0.005
    lo = n_clad + min(0.05, 0.5 * (n_core - n_clad))
    return float(np.clip(n_eff_est, min(lo, hi), hi))


_PROLONG_CACHE: dict = {}


def _prolongation_cached(grid_c: FEMGrid, dg: DeviceGrid):
    """Coarse->fine P2 prolongation, cached per (coarse, fine) pair.

    Returns ``(P_csr, (cols, wts))``: the host CSR plus padded device
    gather tables (Dp, 6) — every P row is the 6 P2 shape values of the
    containing coarse element, so the prolongation runs ON DEVICE as
    six gather-FMAs (see ``_seed_from_coarse``)."""
    import zlib

    from ..ops.femgrid import p2_prolongation

    key = (zlib.crc32(grid_c.elem_dofs.tobytes()), grid_c.n_dofs,
           zlib.crc32(np.ascontiguousarray(
               dg.dof_coords[:dg.n_dofs]).tobytes()), dg.n_dofs)
    hit = _PROLONG_CACHE.get(key)
    if hit is None:
        P = p2_prolongation(grid_c, dg.dof_coords[:dg.n_dofs])
        Pc = P.tocsr()
        n = Pc.shape[0]
        Dp = dg.n_dofs_padded
        W = int(np.diff(Pc.indptr).max()) if Pc.nnz else 1
        cols = np.zeros((Dp, W), np.int32)
        wts = np.zeros((Dp, W), np.float32)
        for r in range(n):
            s, e = Pc.indptr[r], Pc.indptr[r + 1]
            cols[r, :e - s] = Pc.indices[s:e]
            wts[r, :e - s] = Pc.data[s:e]
        hit = (P, (jnp.asarray(cols), jnp.asarray(wts)))
        if len(_PROLONG_CACHE) > 8:
            _PROLONG_CACHE.clear()
        _PROLONG_CACHE[key] = hit
    return hit


@jax.jit
def _seed_from_coarse(Hc16, colmask, Pcols, Pwts, key):
    """Device-side bootstrap seed: prolong + blend + normalize.

    Hc16 (B, 3, nc, k) f16 coarse Ritz vectors (zero-padded columns),
    colmask (B, k) 1.0 on seeded columns, Pcols/Pwts (Dp, W) gather
    tables. Replaces the host-side (3Dp, B, k) seed assembly + its f32
    upload through the ~28 MB/s axon tunnel (~10 s/steady sweep at
    production size) with a ~10 MB f16 upload of the coarse vectors.
    Seeding semantics match the host version: seeded columns normalize
    then blend 5% random (the prolonged span is error-correlated and a
    Chebyshev filter can only shrink a span — see _bootstrap_sweep),
    unseeded columns are unit random.
    """
    B, C, nc, k = Hc16.shape
    Dp, W = Pcols.shape
    Hc = Hc16.astype(jnp.float32)
    F = None
    for j in range(W):
        g = Hc[:, :, Pcols[:, j], :] * Pwts[None, None, :, j, None]
        F = g if F is None else F + g                 # (B, 3, Dp, k)
    F = jnp.transpose(F, (1, 2, 0, 3)).reshape(C * Dp, B, k)
    k1, k2 = jax.random.split(key)
    R1 = jax.random.normal(k1, F.shape, jnp.float32)
    R2 = jax.random.normal(k2, F.shape, jnp.float32)
    nF = jnp.linalg.norm(F, axis=0, keepdims=True) + 1e-30
    nR = jnp.linalg.norm(R1, axis=0, keepdims=True) + 1e-30
    m = colmask[None]                                 # (1, B, k)
    X = F / nF * m + R1 / nR * (1.0 - m)
    X = X + (0.05 / jnp.sqrt(jnp.float32(F.shape[0]))) * R2
    return X / (jnp.linalg.norm(X, axis=0, keepdims=True) + 1e-30)


def _resolve_apply_layout(scfg) -> str:
    """SolverConfig.apply_layout, env PL_FEM_APPLY_LAYOUT fallback.

    Resolved ONCE per solve call (eager, never under trace) and passed
    to the kernels as a static jit argument — the executable cache
    keys on the resolved value."""
    v = scfg.apply_layout or os.environ.get("PL_FEM_APPLY_LAYOUT") \
        or "packed"
    if v not in ("packed", "flat"):
        raise ValueError(f"apply_layout must be 'packed' or 'flat', "
                         f"got {v!r}")
    return v


def _resolve_accumulate(scfg) -> str:
    """SolverConfig.accumulate, env PL_FEM_ACC fallback."""
    v = scfg.accumulate or os.environ.get("PL_FEM_ACC") or "gather"
    if v not in ("gather", "blk"):
        raise ValueError(f"accumulate must be 'gather' or 'blk', "
                         f"got {v!r}")
    return v


def _as_device_grid(grid, config: SimulationConfig) -> DeviceGrid:
    if isinstance(grid, DeviceGrid):
        return grid
    if isinstance(grid, FEMGrid):
        return export_device_grid(grid, config.mesh.bucket_rounding)
    raise TypeError(f"expected FEMGrid or DeviceGrid, got {type(grid)}")


class TrueVectorialMaxwellSolver:
    """Vectorial H-field solver (reference seam: solver_fem.py:113-239)."""

    METHOD_TAG = "H-field_TPU_v1"
    #: wall-clock phase breakdown of the most recent solve_sweep call
    #: (bootstrap / assemble / bounds / host_family / filter / polish /
    #: postproc) — profiling hook, populated per call.
    last_sweep_times: Dict[str, float] = {}
    # debug_checks: per-design diagnosis of the LAST solve_sweep call
    # (design index -> message); empty when every design solved clean
    last_sweep_diagnostics: Dict[int, str] = {}

    def __init__(self, geometry, use_pml: bool = False,
                 config: Optional[SimulationConfig] = None):
        self.geometry = geometry
        self.k0 = float(geometry.k0)
        self.use_pml = use_pml
        self.config = config or SimulationConfig()

    # ------------------------------------------------------------------
    def solve_vectorial_modes(self, grid=None, n_modes_target: int = 20,
                              sigma: Optional[float] = None) -> List[Dict]:
        """Solve for guided vectorial modes.

        ``sigma`` (hybrid backend only) overrides the ARPACK shift-invert
        target beta^2. The reference's LP01-derived shift
        (solver_fem.py:187-193) lands inside the dense penalty-spurious
        branch on high-contrast geometries; seeding sigma from a TPU
        solve's beta_max^2 aims ARPACK at the physical cluster, which
        turns the hybrid backend into a usable cross-formulation oracle.
        """
        cfg = self.config
        if grid is None:
            grid = MeshGenerator.generate(self.geometry,
                                          cfg.mesh.refinement, cfg)
        dg = _as_device_grid(grid, cfg)
        if cfg.solver.backend not in ("tpu", "hybrid"):
            raise ValueError(f"unknown solver backend "
                             f"{cfg.solver.backend!r}; use 'tpu' or 'hybrid'")
        if cfg.solver.backend == "hybrid":
            hv = build_host_vector3(dg, self.geometry.eps_params(),
                                    cfg.solver.alpha_penalty)
            betas, hx, hy, hz = self._solve_hybrid(dg, n_modes_target,
                                                   sigma=sigma)
            return self._postprocess(hv, dg, betas, hx, hy, hz,
                                     n_modes_target)
        # tpu backend: the packed sweep machinery with B = 1 (shared
        # code path gets the two-grid bootstrap + per-design bounds)
        return type(self).solve_sweep([self.geometry], dg, n_modes_target,
                                      cfg)[0]

    # -- hybrid backend: reference-identical transverse pencil ----------
    def _solve_hybrid(self, dg: DeviceGrid, n_modes_target: int,
                      sigma: Optional[float] = None):
        import scipy.sparse as sp

        g = self.geometry
        ap = self.config.solver.alpha_penalty
        eps_re, _ = eps_at_quadrature_np(dg, g.eps_params())
        prim = vector3_prims_np(dg, eps_re)
        spat = scalar_pattern(dg)
        T = dg.n_elems
        k2 = self.k0**2

        def csr(blocks):
            return spat.with_blocks(
                np.ascontiguousarray(blocks[:T]).ravel())

        # transverse pencil forms (solver_fem.py:131-167) from primitives
        Axx = csr(prim["i_gygy"] + ap * prim["u_gxgx"] - k2 * prim["u_nn"])
        Ayy = csr(prim["i_gxgx"] + ap * prim["u_gygy"] - k2 * prim["u_nn"])
        Axy = csr(-prim["i_gxgy"] + ap * np.swapaxes(prim["u_gxgy"], 1, 2))
        Binv = csr(prim["i_nn"])

        n = dg.n_dofs
        A = sp.bmat([[Axx, Axy], [Axy.T, Ayy]], format="csr")
        B = sp.bmat([[Binv, None], [None, Binv]], format="csr")

        interior = np.where(dg.interior_mask[:n])[0]
        idx = np.concatenate([interior, interior + n])
        A_int = A[idx, :][:, idx]
        B_int = B[idx, :][:, idx]

        if sigma is None:
            n_eff_est = lp01_neff_estimate(self.k0,
                                           float(np.mean(g.core_radii)),
                                           g.n_core, g.n_clad)
            sigma = (self.k0 * n_eff_est) ** 2
        k = min(n_modes_target + 12, A_int.shape[0] - 4)
        beta_sq, evecs = scipy_eigsh_pencil(A_int, B_int, k=k, sigma=sigma,
                                            tol=1e-7, maxiter=12000)
        keep = beta_sq > 0
        beta_sq, evecs = beta_sq[keep], evecs[:, keep]
        betas = np.sqrt(beta_sq)
        ni = len(interior)
        hx = np.zeros((n, len(betas)))
        hy = np.zeros((n, len(betas)))
        hx[interior] = evecs[:ni]
        hy[interior] = evecs[ni:]
        # Hz from the div-free condition div H = 0: with H = (hx, hy,
        # i hz~) e^{i beta z}, hz~ = (dx hx + dy hy) / beta, projected
        # back to the P2 basis via one mass solve. Keeps the mode-dict
        # schema backend-independent (the transverse pencil itself never
        # carries Hz; the reference simply omitted it).
        if len(betas):
            from scipy.sparse.linalg import factorized

            Ngx = csr(prim["u_ngx"])
            Ngy = csr(prim["u_ngy"])
            M = csr(prim["u_nn"])
            Msolve = factorized(M.tocsc())
            rhs = (Ngx @ hx + Ngy @ hy) / betas[None, :]
            hz = np.column_stack([Msolve(rhs[:, i])
                                  for i in range(rhs.shape[1])])
        else:
            hz = np.zeros((n, 0))
        return betas, hx, hy, hz

    # -- two-grid spectral bootstrap (no reference analog) ---------------
    @classmethod
    def _bootstrap_sweep(cls, geometries, dg: DeviceGrid,
                         n_modes_target: int, cfg: SimulationConfig,
                         mesh=None):
        """Coarse-mesh solve -> prolonged Ritz vectors + per-design beta.

        Solves the same sweep on a ~6x-coarser mesh (cheap: element count
        AND filter degree shrink together) and P2-interpolates the
        polished coarse modes onto the fine DOFs. The fine filter then
        starts from a subspace already within discretization error of
        the answer, so one fine pass replaces the random-init 2-4, and
        the coarse betas center the fixed-beta expansion without a fine
        beta pass. Returns (X0 (3Dp, B, k) f32, betas (B,), used mask)
        or None if the bootstrap is not applicable.
        """
        import dataclasses as dc

        scfg = cfg.solver
        g0 = geometries[0]
        B = len(geometries)
        n = dg.n_dofs
        Dp = dg.n_dofs_padded
        k = min(n_modes_target + scfg.extra_vectors, n)

        fine_pts = max(n // 4, 1)
        coarse_min = max(500, fine_pts // 6)
        # the coarse solve only seeds a subspace: in fast mode it runs
        # one beta round too (2e-6-grade coarse roots are wasted on a
        # seed and the qres-gated loop would burn up to 6 rounds)
        coarse_bp = 2 if scfg.beta_passes >= 2 else 1
        # 3-level hierarchy: accuracy mode's coarse grid is ~n/3 (large
        # enough that ITS random-init filter is the bootstrap phase's
        # dominant cost) — let the recursion bootstrap it too. Fast
        # mode's coarse grid is a ~2k-point cloud; a third level there
        # only adds fixed per-solve overhead (seed quality is
        # irrelevant to the single fine pass — see the ref_c walk).
        coarse_cfg = dc.replace(
            cfg, mesh_min_points=coarse_min,
            mesh_target_points=4 * coarse_min,
            mesh=dc.replace(cfg.mesh, bucket_rounding=256),
            solver=dc.replace(scfg, bootstrap=scfg.beta_passes >= 2,
                              cheb_degree=max(100, scfg.cheb_degree // 2),
                              cheb_passes=2, beta_passes=coarse_bp))
        try:
            # The point cloud's size is set by the refinement factor (the
            # config's min-points only ever refines upward), so walk
            # refinement DOWN until the mesh is genuinely coarser than
            # the fine grid. The x4 red-refinement granularity can
            # overshoot n//3 for EVERY candidate when the fine mesh
            # came from a dense direct cloud (fan-density floors bound
            # the cloud from below) — the min-points=500 rungs accept
            # the raw cloud with no refinement at all, which is still a
            # fine subspace seed.
            grid_c = None
            fallback = None
            if scfg.beta_passes == 1:
                # fast mode: final accuracy is set by the single fine
                # pass, not the seed (measured identical ~8e-4 with a
                # 6k-dof cloud seed and a 27k-dof half-size seed at the
                # 60k-DOF bench mesh) — take the cheapest coarse grid
                for ref_c in (0.4, 0.3):
                    ccfg = dc.replace(coarse_cfg, mesh_min_points=500,
                                      mesh_target_points=2000)
                    cand = MeshGenerator.generate(g0, ref_c, ccfg)
                    if cand.n_dofs <= n // 3:
                        grid_c = cand
                        break
            if grid_c is None:
                for ref_c in (0.5, 0.4, 0.3, 0.25):
                    cand = MeshGenerator.generate(g0, ref_c, coarse_cfg)
                    if cand.n_dofs <= n // 3:
                        grid_c = cand
                        break
                    if cand.n_dofs * 2.2 <= n and (
                            fallback is None
                            or cand.n_dofs < fallback.n_dofs):
                        fallback = cand
            if grid_c is None:
                # a half-size coarse grid is a BETTER seed than a tiny
                # raw cloud (h-ratio ~1.5 vs ~4) for the accuracy mode's
                # qres-gated rounds, at a coarse solve still ~3x cheaper
                # than a fine pass
                grid_c = fallback
            if grid_c is None:
                return None
            results_c = cls.solve_sweep(geometries, grid_c,
                                        n_modes_target, coarse_cfg,
                                        _raw_modes=True, mesh=mesh)
        except Exception as e:   # bootstrap is an accelerator, never fatal
            logger.warning("bootstrap solve failed (%s); random init", e)
            return None
        if not any(results_c):
            return None

        _, (Pcols, Pwts) = _prolongation_cached(grid_c, dg)
        nc = grid_c.n_dofs
        # Seed only HALF the columns from the coarse modes: the
        # prolonged columns share the prolongation's error directions
        # (correlated), so a fully-prolonged span pools into nothing
        # new and the polished root stays first-order in that error
        # (measured ~3e-4 at production size). The random half carries
        # independent error directions, letting the pooled f64 polish
        # cancel to second order (measured qres 1.3e-4 -> ~1e-5, n_eff
        # error -> ~2e-6). A 5% random blend on seeded columns keeps
        # every direction represented: a Chebyshev filter is a
        # polynomial of the operator — it can only SHRINK a span, so a
        # fully prolonged seed freezes the prolongation's missing
        # component permanently (qres plateau ~1.7e-4).
        #
        # The seed is ASSEMBLED ON DEVICE (_seed_from_coarse): only the
        # (B, 3, nc, k_half) coarse Ritz block goes up the tunnel, as
        # f16 (~10 MB vs the ~127 MB f32 fine-grid seed, at a measured
        # ~28 MB/s — ~10 s of the steady production sweep). f16 is
        # harmless for a seed that carries a 5% random blend.
        Hc16 = np.zeros((B, 3, nc, k), dtype=np.float16)
        colmask = np.zeros((B, k), dtype=np.float32)
        betas0 = np.zeros(B)
        used = np.zeros(B, dtype=bool)
        for b, ms in enumerate(results_c):
            nm = min(len(ms), max(k // 2, k - 8))
            if nm == 0:
                continue                 # unseeded -> unit random cols
            for j, mode in enumerate(ms[:nm]):
                Hc16[b, 0, :, j] = mode["Ex_dofs"]
                Hc16[b, 1, :, j] = mode["Ey_dofs"]
                Hc16[b, 2, :, j] = mode["Hz_dofs"]
            colmask[b, :nm] = 1.0
            betas0[b] = float(np.median([m["beta"] for m in ms]))
            used[b] = True
        X0 = _seed_from_coarse(jnp.asarray(Hc16), jnp.asarray(colmask),
                               Pcols, Pwts, jax.random.PRNGKey(11))
        return X0, betas0, used

    # -- same-grid sweep (no reference analog: BASELINE config 2) -------
    @classmethod
    def solve_sweep(cls, geometries, grid, n_modes_target: int = 20,
                    config: Optional[SimulationConfig] = None,
                    _raw_modes: bool = False, mesh=None,
                    diag_out: Optional[Dict[int, str]] = None):
        """Solve B same-grid designs in one packed device sweep.

        All geometries must share the mesh (same core layout at the
        same pitch — one grid); they may differ in wavelength, n_core,
        n_clad, and (within the mesh's interface-band resolution, see
        dataset/bucketing.py) core radii — the multi-band /
        multi-contrast / canonical-bucket dataset workloads. The
        Chebyshev filter runs once with all designs packed along the
        lane axis (ops/kernels.py ``cheb_rr_pass_sweep``); the host f64
        polish instantiates each design's CSR data from a shared
        linear-coefficient family (plus an interface-annulus correction
        when radii differ). Returns a list of mode lists, one per
        geometry.

        ``mesh``: optional 1-D 'designs' jax device mesh — the design
        axis of the filter shards over it (shard_map over the SAME
        fused kernels; kernels.py ``_sweep_sharded_fns``). B is padded
        up to a mesh-size multiple by repeating the last design.

        ``diag_out``: optional dict that receives the per-design
        diagnostics of THIS call (design index -> message). The
        class-level ``last_sweep_diagnostics`` hook is still set, but
        it races under concurrent sweeps (the dataset engine's bucket
        pipeline) — concurrent callers must use ``diag_out``.
        """
        from ..utils import PhaseTimer

        timer = PhaseTimer()
        cls.last_sweep_times = timer.times   # profiling hook (scratch/)
        cfg = config or SimulationConfig()
        scfg = cfg.solver
        dg = _as_device_grid(grid, cfg)
        g0 = geometries[0]
        B = len(geometries)
        n = dg.n_dofs
        Dp = dg.n_dofs_padded

        # diagnostic mode (config.debug_checks): screen non-finite
        # geometry inputs up front. A NaN design packed into the sweep
        # poisons the shared device convergence gate (max over designs),
        # so bad designs are excluded here, diagnosed in
        # ``last_sweep_diagnostics``, and the healthy subset solves.
        diags: Dict[int, str] = diag_out if diag_out is not None else {}
        diags.clear()
        cls.last_sweep_diagnostics = diags
        if scfg.debug_checks:
            for bix, g in enumerate(geometries):
                ep = g.eps_params()
                bad = [f.name for f in dataclasses.fields(ep)
                       if not np.all(np.isfinite(np.asarray(
                           getattr(ep, f.name), dtype=np.float64)))]
                if not np.isfinite(g.k0):
                    bad.append("k0")
                if bad:
                    diags[bix] = ("non-finite geometry inputs: "
                                  + ", ".join(bad))
            if diags:
                logger.warning("debug_checks: %d/%d designs have "
                               "non-finite inputs: %s", len(diags), B,
                               diags)
                good = [i for i in range(B) if i not in diags]
                pre = dict(diags)
                results = [[] for _ in range(B)]
                if good:
                    sub_d: Dict[int, str] = {}
                    sub = cls.solve_sweep([geometries[i] for i in good],
                                          dg, n_modes_target, cfg,
                                          _raw_modes=_raw_modes, mesh=mesh,
                                          diag_out=sub_d)
                    for j, i in enumerate(good):
                        results[i] = sub[j]
                        if j in sub_d:
                            pre[i] = sub_d[j]
                diags.clear()
                diags.update(pre)
                cls.last_sweep_diagnostics = diags
                return results

        n_dev = 1
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            if B < mesh.size:
                # shrink to <= B devices: padding a narrow sweep up to
                # the full mesh multiplies per-chip work instead of
                # dividing it (a 3-slice CMT sweep on the 8-virtual-
                # device CPU test mesh padded to 8 lanes on ONE core)
                from ..parallel import design_mesh
                mesh = design_mesh(list(mesh.devices.flat)[:B]) \
                    if B > 1 else None
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            n_dev = mesh.size
            if B % n_dev:
                pad = n_dev - B % n_dev
                sub_d: Dict[int, str] = {}
                out = cls.solve_sweep(
                    list(geometries) + [geometries[-1]] * pad, dg,
                    n_modes_target, cfg, _raw_modes=_raw_modes, mesh=mesh,
                    diag_out=sub_d)
                diags.clear()
                diags.update({i: m for i, m in sub_d.items() if i < B})
                cls.last_sweep_diagnostics = diags
                return out[:B]
        else:
            mesh = None

        # Working-set guard: very large (elements x packed-lanes) sweeps
        # have crashed this TPU toolchain; split into sub-sweeps instead.
        # Probed r2: 3.8M units (E=21504, B=8, k=22) runs clean end to
        # end at production mesh size; guard set with margin above that.
        # The unit is PER-DEVICE work, so an n-device mesh carries n x
        # the designs per sub-sweep.
        k_est = min(n_modes_target + scfg.extra_vectors, n)
        E_pad = dg.elem_dofs.shape[0]
        # max E_pad * B * k working-set units (env override for probing
        # the real ceiling; see scratch/tune_case.py)
        budget = int(os.environ.get("PL_FEM_SWEEP_BUDGET", "6000000"))
        b_max = max(1, budget // (E_pad * k_est)) * n_dev
        if n_dev > 1:
            b_max -= b_max % n_dev
        if B > b_max:
            out = []
            for s in range(0, B, b_max):
                sub_d = {}
                out.extend(cls.solve_sweep(geometries[s:s + b_max], dg,
                                           n_modes_target, cfg,
                                           _raw_modes=_raw_modes,
                                           mesh=mesh, diag_out=sub_d))
                for j, m in sub_d.items():
                    diags[s + j] = m
            cls.last_sweep_diagnostics = diags
            return out

        # two-grid bootstrap: coarse solve -> X0 + per-design beta0
        boot = None
        if scfg.bootstrap and n >= scfg.bootstrap_min_dofs:
            with timer.phase("bootstrap"):
                boot = cls._bootstrap_sweep(geometries, dg, n_modes_target,
                                            cfg, mesh=mesh)

        with timer.phase("assemble"):
            ga = grid_to_device(dg, dtype=jnp.float32)
            gs = gather_scatter(ga)
            invs, diag = [], None
            for g in geometries:
                qf_g, diag = assemble_vector3_qf(
                    ga, eps_arrays(g.eps_params(), dtype=jnp.float32))
                invs.append(qf_g.inv_eps)
            qs = QFactorSweep(invJT=qf_g.invJT, w=qf_g.w,
                              inv_eps=jnp.stack(invs), gp=ga.grad_phys)
            filt_mask, filt_diag, blk_plan = ga.interior_mask, diag, None
            if _resolve_accumulate(scfg) == "blk":
                # MXU block accumulate: slot-expanded element arrays +
                # block-ordered dof axis inside the filter only (the
                # subspace converts at the solve_lowest_sweep boundary)
                from ..ops.blockplan import expand_qs, get_block_plan
                blk_plan = get_block_plan(dg)
                if blk_plan is not None:
                    qs = expand_qs(qs, blk_plan)
                    gs = blk_plan.device_tables()
                    to_b, bval, _, _ = blk_plan.device_perms()
                    filt_mask = jnp.where(bval, ga.interior_mask[to_b],
                                          False)
                    filt_diag = jnp.where(bval, diag[to_b], 1.0)

        betas = np.array([
            g.k0 * lp01_neff_estimate(g.k0, float(np.mean(g.core_radii)),
                                      g.n_core, g.n_clad)
            for g in geometries])
        # NOTE: bootstrapped solves MUST still honor beta_passes. The
        # round-1 shortcut (skip fine beta rounds because the coarse
        # betas are polish-accurate) left a measured ~4e-4 relative
        # n_eff bias at production size: the bias is not in beta but in
        # the SUBSPACE — the second outer round's refilter + pooled
        # polish is what removes the prolonged subspace's angle error
        # (extra in-pass filtering does not; measured boot_ab.py).
        beta_passes_eff = max(1, scfg.beta_passes)
        # AUTO B^{-1} depth: fast mode WITH a bootstrap seed takes the
        # cheap semi-iteration (binv=1; measured n_eff 7.3e-4 vs
        # binv=4's 8.8e-4 at 2.7x less filter cost at production —
        # binv only steers the warm prolonged subspace there).
        # Everywhere else keep binv=4: from a cold random start binv=1
        # loses ~6e-3 n_eff (subspace never converges; measured
        # /tmp/binv_fast_cmp.log), and the accuracy-mode pooled
        # beta-jitter polish plateaus at ~8e-5 on a binv=1 subspace.
        binv_eff = scfg.binv_degree
        if binv_eff is None:
            binv_eff = 1 if (beta_passes_eff == 1
                             and boot is not None) else 4
        xfer_f16 = (scfg.xfer_dtype == "float16"
                    or (scfg.xfer_dtype is None and beta_passes_eff == 1))
        if boot is not None:
            _, betas_c, used_c = boot
            betas = np.where(used_c, betas_c, betas)
        cuts = np.array([min(b**2 / g.n_clad**2, 1.35 * g.k0**2)
                         for b, g in zip(betas, geometries)])
        parks = 10.0 * np.maximum(cuts, 1.0)

        # Per-design spectrum bounds: sweep members may differ in
        # n_core/n_clad/wavelength, so one design's Gershgorin bound can
        # undershoot another's true spectral radius and silently break
        # the Chebyshev filter. The assemble+bound executable compiles
        # once (shared shapes) and reruns per design — cheap next to the
        # filter, and a tight bound keeps the damping interval narrow.
        from ..ops.kernels import pencil_bounds_elem

        with timer.phase("bounds"):
            bound_devs = []
            for bix, g in enumerate(geometries):
                prim, _, _ = assemble_vector3_system(
                    ga, eps_arrays(g.eps_params(), dtype=jnp.float32))
                big0 = vector3_stacked_A(prim, jnp.float32(betas[bix]),
                                         jnp.float32(scfg.alpha_penalty))
                _, _, bound = pencil_bounds_elem(big0, prim["u_nn"],
                                                 ga.elem_valid, C=3)
                # keep the scalar on device: a float() here would sync
                # the dispatch pipeline once PER DESIGN through the
                # axon tunnel (measured ~3 s/sweep of pure latency)
                bound_devs.append(bound)
            del big0, prim
            # 1.1x margin covers the beta drift across beta passes
            bounds = np.asarray(jnp.stack(bound_devs)) * 1.1

        with timer.phase("host_family"):
            if B == 1:
                # one-off single design: skip the 3x-cost family
                # precompute. conform: on a foreign (bucket-class) grid
                # the polish uses the member-conforming deformed tables,
                # matching the family path's 'deform' correction.
                hv_single = build_host_vector3(
                    dg, g0.eps_params(), scfg.alpha_penalty,
                    conform=(scfg.member_correction == "deform"))
                family = None
            else:
                family = build_host_vector3_family(dg, g0.eps_params(),
                                                   scfg.alpha_penalty)
        mask3 = np.tile(dg.interior_mask[:n], 3).astype(np.float64)
        k = min(n_modes_target + scfg.extra_vectors, n)
        if boot is not None:
            X = boot[0]
            cheb_passes_eff = max(1, scfg.bootstrap_fine_passes)
        else:
            X = jax.random.normal(jax.random.PRNGKey(11), (3 * Dp, B, k),
                                  dtype=jnp.float32)
            cheb_passes_eff = scfg.cheb_passes
        pooled = [None] * B

        # per-design host pencils: lazy views over the shared family —
        # zero per-design (3, nnz) storage (8 instantiated pencils held
        # ~1.2 GB live and their axpys were 67 s of a 111 s steady
        # sweep, scratch/prof_sweep.py); the view's A_i @ V products
        # stream through one family-shared scratch buffer instead
        hv_cache: list = [None] * B

        def _hv(bix):
            if hv_cache[bix] is None:
                g = geometries[bix]
                hv_cache[bix] = hv_single if family is None else \
                    family.design_view(g.n_core**2, g.n_clad**2,
                                       eps_params=g.eps_params(),
                                       correction=scfg.member_correction)
            return hv_cache[bix]

        def _pad_active(idx):
            """Pad an active-design index list to a filter width that
            (a) is a power of two (bounds the number of compiled
            bucket shapes to log2(B)) and (b) divides over the device
            mesh. Padding repeats the last active design."""
            w = 1
            while w < len(idx):
                w *= 2
            if mesh is not None and getattr(mesh, "size", 1) > 1:
                nd = mesh.size
                w = max(w, nd)
                if w % nd:
                    w = ((w + nd - 1) // nd) * nd
            w = min(max(w, 1), B)
            return list(idx) + [idx[-1]] * (w - len(idx))

        results = [[] for _ in range(B)]
        # beta_passes is the MINIMUM round count; when >= 2 (accuracy
        # mode) the qres gate may extend up to max_rounds until the
        # polished roots certify, with a stall detector. beta_passes=1
        # is the explicit fast mode (dataset throughput; ~4e-4 root
        # bias on bootstrapped production solves, below the reference
        # formulation's own ~6e-4 model error at air-clad contrast).
        # Convergence is tracked PER DESIGN: a design whose polished
        # roots certify (or stall) exits the sweep, and later rounds
        # re-filter only the still-active subset (padded to a power of
        # two) — one slow member no longer re-filters the whole sweep
        # (round-2 accuracy mode measured 6.8x fast mode for this
        # reason).
        max_rounds = beta_passes_eff if beta_passes_eff == 1 \
            else max(beta_passes_eff, scfg.qres_max_rounds or 6)
        prev_q = np.full(B, np.inf)
        active = list(range(B))
        Xact = X                      # (3Dp, |sel|, k) active subspace
        sel = list(range(B))          # design index of each Xact column
        for ip in range(max_rounds):
            # residual gate only on the modes the caller needs (theta is
            # ascending; the physical cluster sits at the bottom) — the
            # near-cut junk lanes converge slowest and would otherwise
            # burn whole extra filter passes
            n_gate = min(k, n_modes_target + 4)
            # Accuracy mode: the in-pass driver self-gates (residual
            # tol or <30%-improvement stall; note it always runs >= 2
            # passes since the f32 floor never reaches tol). Fast mode
            # (beta_passes=1) with a bootstrap seed hard-caps at
            # bootstrap_fine_passes — the warm subspace makes pass 2 a
            # near-no-op there, and the cap is what the bootstrap's
            # speedup consists of.
            mp = max(1, scfg.bootstrap_fine_passes) \
                if (boot is not None and beta_passes_eff == 1) else 8
            # The f32 filter has a systematic subspace-error floor
            # (~3e-3 apply residual at production bounds) whose
            # DIRECTION depends on the expansion beta. Rounds filtered
            # at one beta pool correlated errors that the f64 polish
            # cannot cancel (measured plateau: qres ~1.6e-4, n_eff
            # ~3e-4 biased); alternating a small beta jitter between
            # rounds decorrelates them and the pooled polish cancels
            # to second order (qres ~1e-5, n_eff ~2e-6). The jitter is
            # physical-scale-free: the polish solves the full quadratic
            # pencil, so the filter beta only shapes the subspace.
            _jit = (0.0, 2e-3, -2e-3, 4e-3, -4e-3, 6e-3)[ip % 6]
            qs_act = qs if len(sel) == B else \
                qs._replace(inv_eps=qs.inv_eps[np.asarray(sel)])
            with timer.phase("filter"):
                theta, Xr, res = solve_lowest_sweep(
                    qs_act, gs, filt_mask, filt_diag, Xact, cuts[sel],
                    betas[sel] * (1.0 + _jit),
                    scfg.alpha_penalty, bounds[sel],
                    degree=scfg.cheb_degree,
                    passes=cheb_passes_eff, tol=scfg.scalar_tol,
                    parks=parks[sel], n_wanted=n_gate, max_passes=mp,
                    binv_degree=binv_eff, mesh=mesh, blk=blk_plan,
                    layout=_resolve_apply_layout(scfg))
                # start the device->host DMA of every active design's
                # subspace slab up front: the axon tunnel moves the
                # full (3Dp, B, k) f32 block at only ~17 MB/s (measured
                # 7.7 s/round at production size), so the copies run
                # concurrently with the host polish of earlier designs
                # instead of serializing in front of it.
                # Fast mode ships the slab as f16 (half the tunnel
                # bytes): the polish solves the f64 projected pencil on
                # span(X), and Ritz roots are SECOND order in a basis
                # perturbation, so the ~1e-3 quantization costs ~1e-6
                # in n_eff — noise under fast mode's ~8e-4 class.
                # Accuracy mode keeps f32: its pooled-polish target is
                # 2e-6, first-order-comparable to the f16 floor.
                Xr_ship = Xr.astype(jnp.float16) if xfer_f16 else Xr
                slabs = [Xr_ship[:, j, :] for j in range(len(active))]
                for s in slabs:
                    try:
                        s.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        break
            beta_new = betas.copy()
            qnow = {}
            for j, bix in enumerate(active):
                g = geometries[bix]
                with timer.phase("xfer"):
                    Xh = np.asarray(slabs[j], dtype=np.float64)
                if scfg.debug_checks and not np.isfinite(Xh).all():
                    # diagnosed, not a garbage beta: the design leaves
                    # the sweep with an empty mode list and a message
                    # the dataset engine records (skip-and-record)
                    diags[bix] = (f"non-finite filter subspace at round "
                                  f"{ip} (filter diverged or NaN inputs "
                                  f"reached assembly)")
                    logger.warning("debug_checks: design %d: %s", bix,
                                   diags[bix])
                    results[bix] = []
                    pooled[bix] = None
                    continue
                Xh = np.concatenate(
                    [Xh[c * Dp:c * Dp + n] for c in range(3)],
                    axis=0) * mask3[:, None]
                pooled[bix] = Xh if pooled[bix] is None else \
                    np.concatenate([pooled[bix], Xh], axis=1)
                with timer.phase("host_family"):
                    hv = _hv(bix)
                with timer.phase("polish"):
                    bts, H, _, qres = quadratic_subspace(
                        hv, pooled[bix], g.k0,
                        g.k0 * g.n_clad * (1 + 1e-9), g.k0 * g.n_core * 1.01,
                        mask=mask3)
                if len(bts) > k:
                    # The companion linearization of the pooled subspace
                    # can return up to 2m in-window roots; keep the k
                    # best-converged (ARPACK returns exactly k = n + 12,
                    # solver_fem.py:196 — same cardinality contract).
                    keep = np.argsort(qres)[:k]
                    keep = keep[np.argsort(-bts[keep])]
                    bts, H, qres = bts[keep], H[:, keep], qres[keep]
                if len(bts):
                    qnow[bix] = float(qres[:n_modes_target].max())
                    beta_new[bix] = float(np.median(bts))
                    hx, hy, hz = H[:n], H[n:2 * n], H[2 * n:]
                    if _raw_modes:
                        # subspace-seed consumers (two-grid bootstrap)
                        # need only fields + beta; skip the host
                        # postprocessing entirely
                        order = np.argsort(-bts)
                        results[bix] = [
                            {"beta": float(bts[i]),
                             "n_eff": float(bts[i]) / g.k0,
                             "Ex_dofs": hx[:, i], "Ey_dofs": hy[:, i],
                             "Hz_dofs": hz[:, i]}
                            for i in order]
                        continue
                    solver = cls(g, config=cfg)
                    with timer.phase("postproc"):
                        results[bix] = solver._postprocess(
                            hv, dg, bts, hx, hy, hz, n_modes_target)
            # Per-design continue/exit: a design keeps iterating while
            # EITHER its beta still moves OR its polished roots'
            # full-space quadratic residual is above tolerance (the
            # beta-only criterion silently froze bootstrapped
            # production solves after one round with the prolonged
            # subspace's ~4e-4 root bias intact — qres is the honest
            # certificate of the ROOT, independent of how beta was
            # seeded), with a per-design stall detector.
            still = []
            for bix in active:
                if bix in diags:
                    continue
                q_b = qnow.get(bix, np.inf)
                beta_stable = abs(beta_new[bix] - betas[bix]) <= 1e-6
                converged = beta_stable and q_b <= scfg.polish_qres_tol
                stalled = beta_stable and q_b > 0.7 * prev_q[bix]
                prev_q[bix] = q_b
                if not converged and not stalled:
                    still.append(bix)
            logger.debug("sweep round %d: active %d -> %d, qworst=%.2e "
                         "dbeta=%.2e", ip, len(active), len(still),
                         max(qnow.values()) if qnow else np.inf,
                         np.abs(beta_new - betas).max())
            if ip + 1 >= max_rounds or not still:
                break
            betas = beta_new
            cuts = np.array([min(b**2 / g.n_clad**2, 1.35 * g.k0**2)
                             for b, g in zip(betas, geometries)])
            parks = 10.0 * np.maximum(cuts, 1.0)
            col_of = {bix: j for j, bix in enumerate(sel)}
            active = still
            sel = _pad_active(active)
            cols = np.asarray([col_of[bix] for bix in sel])
            Xact = Xr[:, cols, :]
        # the bootstrap's nested solve_sweep re-binds the hooks; restore
        # this (outermost) call's breakdown before returning
        cls.last_sweep_times = timer.times
        cls.last_sweep_diagnostics = diags
        logger.debug("sweep B=%d n=%d: %s", B, n, timer.summary())
        return results

    # -- shared post-processing (solver_fem.py:199-239), host f64 -------
    def _postprocess(self, hv: HostVector3, dg: DeviceGrid, betas,
                     hx, hy, hz, n_modes_target: int) -> List[Dict]:
        g = self.geometry
        n = dg.n_dofs
        if len(betas) == 0:
            return []

        # normalize transverse energy (solver_fem.py:213)
        nrm = np.sqrt(np.sum(hx**2, axis=0) + np.sum(hy**2, axis=0)) + 1e-300
        hx = hx / nrm
        hy = hy / nrm
        if hz is not None:
            hz = hz / nrm

        # divergence energy ratio (solver_fem.py:214-215)
        div_energy = (np.sum(hx * (hv.Dxx @ hx), axis=0)
                      + 2.0 * np.sum(hx * (hv.Dxy @ hy), axis=0)
                      + np.sum(hy * (hv.Dyy @ hy), axis=0))
        div_ratio = div_energy / np.maximum(betas**2, 1e-12)

        # PML radiation damping: first-order perturbation of the real-eps
        # eigenproblem by i*Im(eps), Im(beta^2) = k0^2 <h|Im eps|h> /
        # <h|M|h> on the transverse intensity; Im beta = Im(beta^2) /
        # (2 beta). Feeds radiation_loss's from-Im-beta branch (reference
        # formula losses.py:707-708; its complex-eps source is the scalar
        # CLI path main.py:108-122).
        if hv.Mim is not None:
            num = (np.sum(hx * (hv.Mim @ hx), axis=0)
                   + np.sum(hy * (hv.Mim @ hy), axis=0))
            # hv.M3 is block-diag(M, M, M); use its first block via Dxx's
            # pattern-mate: plain mass = M3[:n, :n]
            Mh = hv.M3[:hx.shape[0], :hx.shape[0]]
            den = (np.sum(hx * (Mh @ hx), axis=0)
                   + np.sum(hy * (Mh @ hy), axis=0))
            beta_im = (self.k0**2 * num / np.maximum(den, 1e-300)
                       / np.maximum(2.0 * betas, 1e-300))
        else:
            beta_im = np.zeros_like(betas)

        xy = dg.dof_coords[:n]
        pos = np.asarray(g.positions)
        rad = np.asarray(g.core_radii)
        d2 = ((xy[:, 0:1] - pos[None, :, 0]) ** 2
              + (xy[:, 1:2] - pos[None, :, 1]) ** 2)
        core = np.any(d2 <= rad[None, :] ** 2, axis=1)
        interior = dg.interior_mask[:n]
        frac_core = (core & interior).sum() / max(interior.sum(), 1)

        energy = hx**2 + hy**2
        tot = energy.sum(axis=0) + 1e-300
        conf = np.clip(energy[core].sum(axis=0) / tot, 0.0, 1.0)

        # in-core powers with whole-domain fallback (solver_fem.py:88-97)
        core_m = core if core.any() else interior
        P_x = (hx**2)[core_m].sum(axis=0) + 1e-300
        P_y = (hy**2)[core_m].sum(axis=0) + 1e-300
        pdl, pidx = polarization_from_powers(P_x, P_y)
        pdl = np.asarray(pdl)
        pidx = np.asarray(pidx)

        ne = betas / self.k0
        modes_raw: List[Dict] = []
        for i in range(len(betas)):
            if ne[i] <= g.n_clad or ne[i] >= g.n_core * 1.01:
                continue
            m = {
                "n_eff": float(ne[i]),
                "beta": float(betas[i]),
                "beta_im": float(beta_im[i]),
                "Ex_dofs": hx[:, i].copy(),
                "Ey_dofs": hy[:, i].copy(),
                "P_x": float(P_x[i]),
                "P_y": float(P_y[i]),
                "PDL_dB": float(pdl[i]),
                "polarization": polarization_label(pidx[i]),
                "confinement": float(conf[i]),
                "core_overlap": float(conf[i]),
                "div_ratio": float(div_ratio[i]),
                "is_vectorial": True,
                "method": self.METHOD_TAG,
            }
            if hz is not None:
                m["Hz_dofs"] = hz[:, i].copy()
            modes_raw.append(m)
        if not modes_raw:
            return []

        # divergence filter (solver_fem.py:228-231)
        dr = np.array([m["div_ratio"] for m in modes_raw])
        dr_thresh = max(np.median(dr) * 10, dr.min() * 50, 1e-6)
        modes_phys = [m for m in modes_raw if m["div_ratio"] <= dr_thresh]

        # radiation filter (solver_fem.py:234-236)
        conf_thr = max(5.0 * frac_core, 0.05)
        modes_guided = [m for m in modes_phys if m["confinement"] >= conf_thr]
        if not modes_guided:
            modes_guided = modes_phys

        modes_guided.sort(key=lambda m: -m["n_eff"])
        return modes_guided
