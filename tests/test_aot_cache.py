"""AOT executable store: wrapper behavior and key hygiene."""

import jax.numpy as jnp
import pytest
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


def test_source_salt_is_content_based(tmp_path):
    """Identical sources on a different machine (different mtimes) must hash
    the same, so a shipped store keeps hitting; the salt is deterministic."""
    from cosyvoice2_eu_tpu.runtime import aot_cache

    s1 = aot_cache._source_salt()
    aot_cache._source_salt.cache_clear()
    s2 = aot_cache._source_salt()
    assert s1 == s2 and len(s1) == 16


def test_cache_dir_precedence(monkeypatch):
    from cosyvoice2_eu_tpu.runtime import aot_cache

    monkeypatch.delenv("COSY_AOT_CACHE", raising=False)
    aot_cache.set_cache_dir(None)
    assert aot_cache.cache_dir() == "/tmp/cosy_aot"
    aot_cache.set_cache_dir("/models/aot_store")
    assert aot_cache.cache_dir() == "/models/aot_store"
    monkeypatch.setenv("COSY_AOT_CACHE", "/env/wins")
    assert aot_cache.cache_dir() == "/env/wins"
    monkeypatch.setenv("COSY_AOT_CACHE", "off")
    assert aot_cache.cache_dir() is None
    aot_cache.set_cache_dir(None)


@pytest.mark.slow
def test_warmup_flow_runs_tiny(monkeypatch, tmp_path):
    """cosy2-eu warmup flow end-to-end on the tiny config (CPU: programs run
    and the store path is wired; persistence itself is accelerator-only)."""
    import cosyvoice2_eu_tpu as cosy
    from cosyvoice2_eu_tpu.config import tiny_test_config
    from cosyvoice2_eu_tpu.runtime import aot_cache
    from cosyvoice2_eu_tpu.runtime.warmup import warmup_programs

    monkeypatch.delenv("COSY_AOT_CACHE", raising=False)
    aot_cache.set_cache_dir(str(tmp_path / "store"))
    try:
        api = cosy.load(config=tiny_test_config(), seed=0)
        stats = warmup_programs(api._model, prompt_seconds=(1,), batch=0)
        assert stats["modes"] == 3
    finally:
        aot_cache.set_cache_dir(None)


def test_load_picks_up_shipped_store(monkeypatch, tmp_path):
    from cosyvoice2_eu_tpu.runtime import aot_cache

    monkeypatch.delenv("COSY_AOT_CACHE", raising=False)
    store = tmp_path / "aot_store"
    store.mkdir()
    # load() fails later on missing checkpoints, but must set the store first
    import cosyvoice2_eu_tpu as cosy

    try:
        cosy.load(model_dir=str(tmp_path))
    except Exception:
        pass
    assert aot_cache.cache_dir() == str(store)
    aot_cache.set_cache_dir(None)


def test_prune_stale_salts(monkeypatch, tmp_path):
    """The implicit scratch store drops entries from other source versions
    (every edit changes the salt; without pruning the store grows by a full
    program set per edit).  Explicit stores are never pruned."""
    from cosyvoice2_eu_tpu.runtime import aot_cache

    monkeypatch.delenv("COSY_AOT_CACHE", raising=False)
    monkeypatch.setattr(aot_cache, "_cache_dir_override", None)
    salt = aot_cache._source_salt()
    cur = tmp_path / f"lm-TPU_v5-{salt}-{'a' * 24}.aot"
    stale = tmp_path / f"lm-TPU_v5-{'0' * 16}-{'b' * 24}.aot"
    other = tmp_path / "notes.txt"
    for f in (cur, stale, other):
        f.touch()
    monkeypatch.setattr(aot_cache, "_pruned", False)
    aot_cache._prune_stale(str(tmp_path))
    assert cur.exists() and other.exists() and not stale.exists()

    # explicit store: untouched
    stale.touch()
    monkeypatch.setattr(aot_cache, "_pruned", False)
    monkeypatch.setattr(aot_cache, "_cache_dir_override", str(tmp_path))
    aot_cache._prune_stale(str(tmp_path))
    assert stale.exists()
