"""Probe: does the persistent compile cache work on the axon TPU backend?

Run twice: first run should compile+write, second should hit.
Usage: python scratch/cache_probe2.py /tmp/cache_probe_dir
"""
import logging
import sys
import time

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp

cache_dir = sys.argv[1]
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_explain_cache_misses", True)
except Exception as e:
    print("no explain_cache_misses:", e)

print("devices:", jax.devices())
d = jax.devices()[0]
print("device attrs:", {k: getattr(d, k, None) for k in (
    "id", "platform", "device_kind", "coords", "core_on_chip",
    "process_index", "serial")})


@jax.jit
def f(x):
    for _ in range(30):
        x = jnp.tanh(x @ x) + x
    return x


x = jnp.ones((512, 512), jnp.float32)
t0 = time.time()
f(x).block_until_ready()
print(f"first call (compile?): {time.time() - t0:.2f}s")
t0 = time.time()
f(x).block_until_ready()
print(f"second call: {time.time() - t0:.3f}s")

import os
print("cache dir contents:", os.listdir(cache_dir))
