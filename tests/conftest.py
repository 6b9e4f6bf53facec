import os

# Tests run on a virtual 8-device CPU mesh by default so sharding code
# paths are exercised deterministically without TPU hardware.  The
# session's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (tunnelled TPU), so the env var alone is too late —
# update jax.config too.
#
# MCFOST_TPU_TESTS=1 keeps the real device for the hardware-marked sweep:
#   MCFOST_TPU_TESTS=1 python -m pytest tests/ -m tpu
_ON_TPU = os.environ.get("MCFOST_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the fast pass compiles hundreds of
# kernels; caching them on disk makes re-runs (and the per-file runner's
# fresh processes) cheap.  Harmless on the TPU pass too.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
