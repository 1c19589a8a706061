import os

# Force a virtual 8-device CPU mesh for all tests: multi-chip sharding is
# validated without TPU hardware, and float64/int64 run natively.  The env
# var alone is not enough here — the axon harness pre-imports JAX with
# JAX_PLATFORMS=axon — so also flip the live config.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
