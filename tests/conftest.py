import os

# 8 virtual CPU devices for multi-chip sharding tests; must be set before jax import
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env points at the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# sitecustomize imports jax before this conftest runs, so the env var alone is
# too late — update the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
