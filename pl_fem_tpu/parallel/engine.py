"""Design-parallel solve engine over a jax device mesh.

The reference is strictly serial (SURVEY.md §2.1: no distribution of
any kind; one design after another through ARPACK, main.py:343). The
TPU-native scale-out exploits the one parallelism this workload has:
thousands of LHS designs are embarrassingly parallel. Designs whose
meshes fall in the same (element, DOF) bucket share array shapes, so a
whole batch runs as ONE executable:

    per-design element blocks --stack--> (B, E, 6C, 6C)
    jit(vmap(cheb_rr_pass)) over the batch
    NamedSharding(P('designs')) lays the batch over the mesh; XLA
    partitions the purely-elementwise-over-B computation with zero
    collectives on the hot path (ICI is only touched by the psum in
    :func:`sharded_residual_stats`).

Host-side f64 polish stays per-design (cheap CSR work) and is done by
the caller; this module owns the device-side filtering.
"""
from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kernels
from ..ops.assembly import (
    assemble_scalar_system,
    assemble_vector3_system,
    eps_arrays,
    gather_scatter,
    grid_to_device,
    vector3_stacked_A,
)
from ..ops.femgrid import DeviceGrid


class DesignBatch(NamedTuple):
    """Stacked per-design solver inputs (leading axis = design)."""

    Abig: jax.Array        # (B, E, 6C, 6C)
    Bblk: jax.Array        # (B, E, 6, 6)
    gs: kernels.GatherScatter  # leaves stacked (B, ...)
    mask: jax.Array        # (B, D)
    dinv_sqrt: jax.Array   # (B, D)
    park: jax.Array        # (B,)
    cut: jax.Array         # (B,)
    bound: jax.Array       # (B,)
    lo: jax.Array          # scalar (universal mass constant)
    hi: jax.Array          # scalar
    n_components: int      # static


def assemble_design_batch(geometries: Sequence, dgs: Sequence[DeviceGrid],
                          vectorial: bool = True,
                          alpha_penalty: float = 1.0,
                          beta0s: Optional[Sequence[float]] = None
                          ) -> DesignBatch:
    """Assemble and stack same-bucket designs into one DesignBatch.

    For the vectorial path ``beta0s`` fixes each design's expansion
    point (defaults to the LP01 estimate); scalar designs get the
    (K - k0^2 M_eps, M) pencil with its guided-window cut.
    """
    from ..solvers.vectorial import lp01_neff_estimate

    buckets = {dg.bucket for dg in dgs}
    if len(buckets) != 1:
        raise ValueError(f"designs span multiple buckets: {buckets}")

    Abigs, Bblks, gss, masks, dinvs = [], [], [], [], []
    parks, cuts, bounds = [], [], []
    C = 3 if vectorial else 1
    for i, (geom, dg) in enumerate(zip(geometries, dgs)):
        ga = grid_to_device(dg, dtype=jnp.float32)
        ea = eps_arrays(geom.eps_params(), dtype=jnp.float32)
        k0 = float(geom.k0)
        if vectorial:
            prim, diag, _ = assemble_vector3_system(ga, ea)
            beta0 = float(beta0s[i]) if beta0s is not None else \
                k0 * lp01_neff_estimate(k0, float(np.mean(geom.core_radii)),
                                        geom.n_core, geom.n_clad)
            Abig = vector3_stacked_A(prim, jnp.float32(beta0),
                                     jnp.float32(alpha_penalty))
            Bblk = prim["u_nn"]
            mask = ga.interior_mask
            cut = min(beta0**2 / geom.n_clad**2, 1.35 * k0**2)
            park = 10.0 * max(cut, 1.0)
        else:
            Abig, Bblk, diag = assemble_scalar_system(ga, ea,
                                                      jnp.float32(k0))
            mask = ga.dof_valid
            window = k0**2 * max(geom.n_core**2 - geom.n_clad**2, 1e-6)
            cut = -(k0 * geom.n_clad) ** 2 + 0.02 * window
            park = 1.0
        lo, hi, bound = kernels.pencil_bounds_elem(Abig, Bblk,
                                                   ga.elem_valid, C=C)
        bound = float(jnp.maximum(jnp.maximum(bound, park * 1.05),
                                  cut * 1.5 + 1.0))
        Abigs.append(Abig)
        Bblks.append(Bblk)
        gss.append(gather_scatter(ga))
        masks.append(mask.astype(jnp.float32))
        dinvs.append((1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
                      ).astype(jnp.float32))
        parks.append(park)
        cuts.append(cut)
        bounds.append(bound)

    f32 = jnp.float32
    gs_stacked = kernels.GatherScatter(
        elem_dofs=jnp.stack([g.elem_dofs for g in gss]),
        idx_v=jnp.stack([g.idx_v for g in gss]),
        valid_v=jnp.stack([g.valid_v for g in gss]),
        idx_e=jnp.stack([g.idx_e for g in gss]),
        valid_e=jnp.stack([g.valid_e for g in gss]))
    return DesignBatch(
        Abig=jnp.stack(Abigs), Bblk=jnp.stack(Bblks),
        gs=gs_stacked, mask=jnp.stack(masks),
        dinv_sqrt=jnp.stack(dinvs),
        park=jnp.asarray(parks, f32), cut=jnp.asarray(cuts, f32),
        bound=jnp.asarray(bounds, f32),
        lo=jnp.asarray(kernels.MASS_LO, f32),
        hi=jnp.asarray(kernels.MASS_HI, f32),
        n_components=C,
    )


# ----------------------------------------------------------------------------
# mesh + sharding helpers
# ----------------------------------------------------------------------------

def design_mesh(devices=None) -> Mesh:
    """1-D device mesh with a 'designs' data-parallel axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("designs",))


def shard_batch(batch: DesignBatch, mesh: Mesh) -> DesignBatch:
    """Lay the design axis over the mesh (batch size must divide it)."""
    spec = NamedSharding(mesh, P("designs"))
    rep = NamedSharding(mesh, P())
    out = {}
    for name, val in batch._asdict().items():
        if name == "n_components":
            out[name] = val
        elif name == "gs":
            out[name] = kernels.GatherScatter(
                *[jax.device_put(leaf, spec) for leaf in val])
        elif hasattr(val, "ndim") and val.ndim >= 1:
            out[name] = jax.device_put(val, spec)
        else:
            out[name] = jax.device_put(val, rep)
    return DesignBatch(**out)


def batched_solve(batch: DesignBatch, k: int, degree: int = 300,
                  passes: int = 3, seed: int = 0):
    """Run ``passes`` batched filter+RR passes over all designs.

    Returns (theta (B, k), X (B, CD, k), res (B, k)) living on whatever
    sharding the batch carries — call through :func:`shard_batch` first
    to distribute over a mesh.
    """
    B = batch.Abig.shape[0]
    CD = batch.n_components * batch.mask.shape[1]
    X = jax.random.normal(jax.random.PRNGKey(seed), (B, CD, k),
                          dtype=jnp.float32)
    if hasattr(batch.Abig, "sharding") and \
            isinstance(batch.Abig.sharding, NamedSharding):
        X = jax.device_put(
            X, NamedSharding(batch.Abig.sharding.mesh, P("designs")))
    theta = res = None
    for _ in range(passes):
        theta, X, res = kernels.cheb_rr_pass_batched(
            batch.Abig, batch.Bblk, batch.gs, batch.mask,
            batch.dinv_sqrt, batch.lo, batch.hi, batch.park, X,
            batch.cut, batch.bound, C=batch.n_components, degree=degree)
    return theta, X, res


def sharded_residual_stats(res: jax.Array, theta: jax.Array,
                           cut: jax.Array, mesh: Mesh):
    """Global (max residual, wanted-mode count) via psum/pmax over ICI.

    A shard_map collective so the host reads two scalars instead of
    gathering the full (B, k) arrays — the pattern record-collection
    uses at scale.
    """

    def local_stats(res_l, theta_l, cut_l):
        wanted = (theta_l < cut_l[:, None]).astype(jnp.float32)
        maxres = jnp.max(res_l * wanted)
        count = jnp.sum(wanted)
        maxres = jax.lax.pmax(maxres, "designs")
        count = jax.lax.psum(count, "designs")
        return maxres, count

    fn = jax.shard_map(local_stats, mesh=mesh,
                       in_specs=(P("designs"), P("designs"), P("designs")),
                       out_specs=(P(), P()))
    return fn(res, theta, cut)
