"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication)."""
import os

# Some managed TPU environments import jax from sitecustomize at
# interpreter start and pin jax_platforms before env vars can act — env
# vars set here are TOO LATE. Override via jax.config after import
# instead; backends initialize lazily, so this still takes effect.
# Without it every eager op rides the attached device (and, on remote-
# compile setups, every jit queues on a remote service); on local CPU
# the whole suite compiles locally.
os.environ["JAX_PLATFORMS"] = "cpu"   # belt-and-braces for subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: keeps reruns warm.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
