import os

# Tests run hermetically on a virtual 8-device CPU mesh (the real TPU is
# reserved for bench.py).  The environment's sitecustomize registers the
# tunneled `axon` TPU platform and forces jax_platforms="axon,cpu" at
# interpreter start, so env vars alone don't stick — override the jax config
# directly before any backend is initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache amortizes CPU compiles across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
