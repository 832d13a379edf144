"""Probe Mosaic/Pallas support for in-kernel dynamic row gathers.

Three candidate mechanisms, smallest first:
  1. vector indexing x_ref[idx] / jnp.take inside the kernel
  2. per-row fori_loop of dynamic slices (pl.ds)
  3. one-hot matmul gather (MXU)
Usage: python -u scratch/pallas_probe.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, W, L = 1024, 512, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((D, L)), jnp.float32)
idx = jnp.asarray(rng.integers(0, D, size=(W,)), jnp.int32)
want = np.asarray(x)[np.asarray(idx)]


def try_case(name, fn):
    try:
        out = jax.block_until_ready(fn())
        ok = np.allclose(np.asarray(out), want, atol=1e-6)
        print(f"{name}: ran, correct={ok}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


# 1. vector indexing
def k1(x_ref, i_ref, o_ref):
    o_ref[:] = x_ref[i_ref[:], :]


def c1():
    return pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 1b. jnp.take
def k1b(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)


def c1b():
    return pl.pallas_call(
        k1b,
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 2. fori_loop of dynamic slices
def k2(x_ref, i_ref, o_ref):
    def body(r, _):
        o_ref[pl.ds(r, 1), :] = x_ref[pl.ds(i_ref[r], 1), :]
        return 0
    jax.lax.fori_loop(0, W, body, 0)


def c2():
    return pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 3. one-hot matmul
def k3(x_ref, i_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, D), 1)
    onehot = (rows == i_ref[:, None]).astype(jnp.float32)
    o_ref[:] = jnp.dot(onehot, x_ref[:],
                       preferred_element_type=jnp.float32)


def c3():
    return pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


print("devices:", jax.devices())
try_case("vector-index", c1)
try_case("jnp.take", c1b)
try_case("fori+ds", c2)
try_case("one-hot matmul", c3)
print("DONE")
