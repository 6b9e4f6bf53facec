import os

# Tests always run on a virtual 8-device CPU mesh so sharding code paths are
# exercised deterministically without TPU hardware.  The session's
# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
# (tunnelled TPU), so the env var alone is too late — update jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
