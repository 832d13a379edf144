"""Is the lowered HLO of the sweep kernels stable across processes?

Runs on CPU (no TPU contention). Prints a sha256 of the StableHLO text
for cheb_sweep_chunk + cheb_sweep_rr at a tiny sweep shape. Run twice
in separate processes and compare hashes.
"""
import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pl_fem_tpu.ops import kernels as K

E, D, B, k, Q = 40, 60, 3, 5, 4
rng = np.random.default_rng(0)
qs = K.QFactorSweep(
    invJT=jnp.asarray(rng.normal(size=(E, 2, 2)), jnp.float32),
    w=jnp.asarray(rng.random((E, Q)), jnp.float32),
    inv_eps=jnp.asarray(rng.random((B, E, Q)), jnp.float32),
    gp=jnp.asarray(rng.normal(size=(E, Q, 6, 2)), jnp.float32))
ed = rng.integers(0, D, size=(E, 6)).astype(np.int32)
split = 40
gs = K.GatherScatter(
    elem_dofs=jnp.asarray(ed),
    idx_v=jnp.asarray(rng.integers(0, E * 6, size=(split, 7)),
                      jnp.int32),
    valid_v=jnp.asarray(rng.random((split, 7)) > 0.5),
    idx_e=jnp.asarray(rng.integers(0, E * 6, size=(D - split, 2)),
                      jnp.int32),
    valid_e=jnp.asarray(rng.random((D - split, 2)) > 0.5))
mask = jnp.ones((D,), jnp.float32)
dinv = jnp.ones((D,), jnp.float32)
args = (qs, gs, mask, dinv, jnp.float32(0.5), jnp.float32(1.5),
        jnp.ones((B,), jnp.float32) * 10, jnp.ones((B,), jnp.float32) * 6,
        jnp.float32(1.0),
        jnp.zeros((D, B, 3, k), jnp.float32),
        jnp.zeros((D, B, 3, k), jnp.float32),
        jnp.ones((B,), jnp.float32), jnp.ones((B,), jnp.float32) * 2,
        jnp.int32(8), jnp.asarray(True))

lowered = jax.jit(K.cheb_sweep_chunk_impl,
                  static_argnames=("binv_degree", "renorm_every")
                  ).lower(*args)
txt = lowered.as_text()
print("chunk HLO sha:", hashlib.sha256(txt.encode()).hexdigest())

args_rr = (qs, gs, mask, jnp.ones((B,), jnp.float32),
           jnp.ones((B,), jnp.float32) * 6, jnp.float32(1.0),
           jnp.zeros((D, B, 3, k), jnp.float32))
low2 = jax.jit(K.cheb_sweep_rr_impl).lower(*args_rr)
print("rr HLO sha:",
      hashlib.sha256(low2.as_text().encode()).hexdigest())
