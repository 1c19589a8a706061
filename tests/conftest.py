import os

# Force a virtual 8-device CPU mesh for all tests: multi-chip sharding is
# validated without TPU hardware, and float64/int64 run natively.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
