"""AOT executable store: wrapper behavior and key hygiene."""

import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.runtime import aot_cache


def test_aot_jit_executes_and_caches_per_shape():
    calls = {"n": 0}

    def f(x):
        calls["n"] += 1  # traced once per shape
        return x * 2.0

    g = aot_cache.aot_jit("test_fn", f)
    a = jnp.ones((4,))
    b = jnp.ones((8,))
    np.testing.assert_allclose(np.asarray(g(a)), 2.0)
    np.testing.assert_allclose(np.asarray(g(a)), 2.0)
    np.testing.assert_allclose(np.asarray(g(b)), 2.0)
    assert calls["n"] == 2  # one trace per distinct shape, none on re-call


def test_arg_sig_distinguishes_shapes_dtypes_structure():
    sig = aot_cache._arg_sig
    a = (jnp.ones((2, 3)),)
    assert sig(a) == sig((jnp.ones((2, 3)),))
    assert sig(a) != sig((jnp.ones((3, 2)),))
    assert sig(a) != sig((jnp.ones((2, 3), jnp.bfloat16),))
    assert sig(a) != sig(({"x": jnp.ones((2, 3))},))


def test_cpu_backend_skips_persistence(tmp_path, monkeypatch):
    monkeypatch.setenv("COSY_AOT_CACHE", str(tmp_path))
    g = aot_cache.aot_jit("never_persist", lambda x: x + 1)
    np.testing.assert_allclose(np.asarray(g(jnp.zeros((2,)))), 1.0)
    # CPU (the test backend) must not write machine-sensitive AOT artifacts
    assert not list(tmp_path.iterdir())


def test_disable_via_env(monkeypatch):
    monkeypatch.setenv("COSY_AOT_CACHE", "off")
    assert aot_cache.cache_dir() is None
