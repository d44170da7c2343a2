import os

# Tests run hermetically on a virtual 8-device CPU mesh (the real TPU is
# reserved for bench.py).  Force-set: the environment pre-sets
# JAX_PLATFORMS=axon for the tunneled TPU, which setdefault would keep.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache amortizes CPU compiles across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
