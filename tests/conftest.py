import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware. XLA_FLAGS must be set before
# importing jax; the platform override must go through jax.config because
# this image's axon TPU plugin takes priority over the JAX_PLATFORMS env.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent XLA cache stays ON for tests: pl_fem_tpu scopes
# XLA:CPU entries per host fingerprint (foreign-host AOT entries run
# scalar-gather fallback codegen, pathologically slow), and the
# chunk-kernel compiles the cache saves take minutes on this host.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
