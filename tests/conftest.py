"""Test harness: simulate an 8-device TPU mesh on CPU.

The jax analog of the reference's ddp_sim trainer config
(third_party/Matcha-TTS/configs/trainer/ddp_sim.yaml): multi-device sharding
tests run on XLA's host-platform device simulation.
"""

import os

# force CPU: the session env pins JAX_PLATFORMS=axon (one real TPU chip), but
# tests need the 8-device simulated mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the axon plugin ignores the env var; the config API reliably forces CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# single-core CI box: persist compiled executables across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cosyvoice2_eu_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
