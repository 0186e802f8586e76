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
# NO persistent compilation cache on CPU: XLA:CPU executable AOT
# (de)serialization is brittle across host CPU-feature profiles — stale
# entries SIGABRT on read and large fresh entries can SIGSEGV on write
# (observed in compilation_cache.{get,put}_executable_and_time).  The TPU
# path keeps its cache + AOT store; CPU tests just recompile.
jax.config.update("jax_compilation_cache_dir", None)
# ... and keep load() from re-enabling it mid-suite (it defaults the cache on
# when the current value is None; "none" is its explicit off switch)
os.environ["COSY_COMPILE_CACHE"] = "none"

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-minute e2e compiles)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute e2e test (deselected by default; --runslow runs it)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow e2e test: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
