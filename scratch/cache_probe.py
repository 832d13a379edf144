"""Probe: does the persistent XLA compile cache work on the axon TPU?

Run twice in separate processes; the second run should hit the cache.
Prints compile wall-clock and the cache dir listing.
"""
import logging
import os
import sys
import time

CACHE = "/tmp/xla_probe_cache"

logging.basicConfig(level=logging.INFO)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_explain_cache_misses", True)

print("devices:", jax.devices(), file=sys.stderr)


@jax.jit
def f(x):
    for _ in range(30):
        x = jnp.tanh(x @ x + 0.1)
    return x


x = jnp.ones((1024, 1024), jnp.float32)
t0 = time.time()
f(x).block_until_ready()
print(f"first call (compile+run): {time.time() - t0:.2f}s")
t0 = time.time()
f(x).block_until_ready()
print(f"second call (cached in-proc): {time.time() - t0:.3f}s")

print("cache dir:", sorted(os.listdir(CACHE)) if os.path.isdir(CACHE)
      else "MISSING")
