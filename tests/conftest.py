"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication)."""
import os

# Must be set before jax import. Force-override: the ambient environment
# pins JAX_PLATFORMS=axon (remote TPU tunnel), which would route every
# eager op through the tunnel and slow tests ~1000x.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the ambient environment routes XLA
# compiles through a remote service with multi-minute queue waits; the
# disk cache short-circuits that on every rerun.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
