import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled: the parity
# gates against the reference NumPy implementation need full precision, and
# the sharding tests need multiple devices.  Real-TPU behaviour is exercised
# by bench.py / __graft_entry__.py.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is not enough: the axon TPU plugin registers itself and
# wins unless the config flag is set too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the DR16 production posterior compiles for
# ~20 min on this one-core host (jit_logp) and the HMC gate adds a ~16 min
# value_and_grad module — caching them across test runs/processes turns
# repeat runs of the production gates from hours into minutes.
try:  # pragma: no cover — best-effort; correctness never depends on it
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass
