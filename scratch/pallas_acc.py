"""Pallas windowed accumulate vs XLA gather-sum on the real mesh.

The accumulate (element entries -> DOF sums) is row-bound in XLA
(~50 ns/gathered row, 43% of the Chebyshev step). This probe builds the
RCM plan, runs a Pallas kernel that DMAs each DOF tile's entry window
into VMEM and sums each dof's entries with a dynamic-bound row loop,
and compares time + correctness against the XLA path.

Usage: python -u scratch/pallas_acc.py [mesh_min] [L]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MESH_MIN = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
L = int(sys.argv[2]) if len(sys.argv) > 2 else 528

from pl_fem_tpu.config import MeshConfig, SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import MeshGenerator, export_device_grid
from pl_fem_tpu.ops.rcm import build_rcm_plan

cfg = SimulationConfig(mesh_min_points=MESH_MIN,
                       mesh_target_points=4 * MESH_MIN,
                       mesh=MeshConfig(bucket_rounding=1024))
g = MCFGeometry(7, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
grid = MeshGenerator.generate(g, 0.7, cfg)
dg = export_device_grid(grid, 1024)
plan = build_rcm_plan(dg, tile=256)
E = dg.elem_dofs.shape[0]
D = dg.dof_coords.shape[0]
T, tile, W, GW = plan.n_tiles, plan.tile, plan.win_elems, plan.gw
WE = W * 6
print(f"mesh {grid.n_points} pts {grid.n_dofs} dofs D={D} E={E} "
      f"T={T} win_elems={W} win_dofs={plan.win_dofs} gw={GW} "
      f"bw={plan.bandwidth}", flush=True)
print(f"window VMEM: {(WE + 8) * L * 4 / 1e6:.1f} MB", flush=True)

rng = np.random.default_rng(0)
Ye = jnp.asarray(rng.standard_normal((E * 6, L)), jnp.float32)

# ---- reference: per-dof sum in numpy (in RCM space) ----------------
# entry rows of Ye are in WINDOW element order (row j = plan.eorder[j])
ne, nd = dg.n_elems, dg.n_dofs
Ye_np = np.asarray(Ye)
want = np.zeros((D, L), np.float32)
edr = plan.elem_dofs_r[:ne]
np.add.at(want, edr.ravel(),
          Ye_np[: ne * 6].reshape(ne * 6, L))

starts = jnp.asarray(plan.e_start * 6, jnp.int32)   # entry-row starts
pack = jnp.asarray(plan.acc_pack)
PR = pack.shape[1]
STRIDE = GW + 1


def acc_kernel(starts_ref, pack_hbm, ye_hbm, out_ref, win, spack, sems):
    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], 8)
    cp = pltpu.make_async_copy(
        ye_hbm.at[pl.ds(start, WE), :], win.at[pl.ds(0, WE), :],
        sems.at[0])
    cp.start()
    ci = pltpu.make_async_copy(pack_hbm.at[t], spack, sems.at[1])
    ci.start()
    ci.wait()
    cp.wait()

    def row(d, _):
        base = d * STRIDE

        def body(s, acc):
            j = base + 1 + s
            return acc + win[pl.ds(spack[j // 128, j % 128], 1), :]

        acc = jax.lax.fori_loop(
            0, spack[base // 128, base % 128], body,
            jnp.zeros((1, L), jnp.float32))
        out_ref[pl.ds(d, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, tile, row, 0)


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(T,),
    in_specs=[
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ],
    out_specs=pl.BlockSpec((tile, L), lambda t, s: (t, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((WE + 8, L), jnp.float32),
        pltpu.SMEM((PR, 128), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
    ],
)


@jax.jit
def pallas_acc(ye):
    return pl.pallas_call(
        acc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, L), jnp.float32),
    )(starts, pack, ye)


print("compiling pallas...", flush=True)
t0 = time.time()
out = jax.block_until_ready(pallas_acc(Ye))
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
err = np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-30)
print(f"pallas correct: rel err {err:.2e}", flush=True)

t0 = time.time()
for _ in range(20):
    out = pallas_acc(Ye)
jax.block_until_ready(out)
dt = (time.time() - t0) / 20
print(f"pallas accumulate: {dt*1000:.2f} ms/iter", flush=True)

# ---- XLA path for comparison (original numbering, same volume) -----
from pl_fem_tpu.ops.assembly import gather_scatter, grid_to_device

ga = grid_to_device(dg, dtype=jnp.float32)
gs = gather_scatter(ga)


@jax.jit
def xla_acc(flat):
    pv = jnp.where(gs.valid_v[..., None], flat[gs.idx_v], 0.0).sum(axis=1)
    pe = jnp.where(gs.valid_e[..., None], flat[gs.idx_e], 0.0).sum(axis=1)
    return jnp.concatenate([pv, pe], axis=0)


out2 = jax.block_until_ready(xla_acc(Ye))
t0 = time.time()
for _ in range(20):
    out2 = xla_acc(Ye)
jax.block_until_ready(out2)
dt2 = (time.time() - t0) / 20
print(f"xla accumulate:    {dt2*1000:.2f} ms/iter  "
      f"(speedup {dt2/dt:.1f}x)", flush=True)
print("DONE", flush=True)
