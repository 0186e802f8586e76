"""Decode-loop semantics for special ids: EOS stops, fill/sos are fed back
but never emitted, and the emitted stream stays compact (no gaps).

Pins the reference behavior (llm.py:707-718) at the decode-loop level by
scripting the sampler, so loop semantics are isolated from sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cosyvoice2_eu_tpu.models.llm as llm_mod
from cosyvoice2_eu_tpu.config import tiny_test_config

CFG = tiny_test_config().llm
EOS = CFG.eos_token
FILL = EOS + 2


@pytest.fixture()
def scripted(monkeypatch):
    """Replace the sampler with a per-step script; returns the setter."""

    def set_script(script):  # (max_gen, B) int32
        arr = jnp.asarray(script, jnp.int32)

        def fake_sample(params, cfg, state, prompt_len, min_len, max_len):
            return arr[state.step], state.rng

        monkeypatch.setattr(llm_mod, "_sample_tokens", fake_sample)

    return set_script


def _decode(script, max_gen):
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    b = len(script[0])
    p_bucket = 8
    ids = jnp.zeros((b, p_bucket), jnp.int32)
    src = jnp.zeros((b, p_bucket), jnp.int32)
    pl = jnp.full((b,), 4, jnp.int32)
    mn = jnp.zeros((b,), jnp.int32)
    mx = jnp.full((b,), max_gen, jnp.int32)
    return llm_mod.lm_decode(
        params, CFG, ids, src, pl, mn, mx, jax.random.key(1), max_gen
    )


def test_specials_fed_back_not_emitted(scripted):
    # row 0 samples a FILL mid-stream; row 1 finishes earlier with EOS
    script = [
        [5, 3],
        [FILL, 4],
        [7, EOS],
        [9, 0],
        [EOS, 0],
        [0, 0],
    ]
    scripted(script)
    tokens, lengths = jax.jit(_decode, static_argnums=1)(script, len(script))
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    # FILL consumed a step but left no gap: emissions are compact
    assert lengths.tolist() == [3, 2]
    assert tokens[0, :3].tolist() == [5, 7, 9]
    assert tokens[1, :2].tolist() == [3, 4]
    # nothing written past the emission cursor
    assert tokens[0, 3:].tolist() == [0] * (tokens.shape[1] - 3)


def test_eos_is_exact_not_threshold(scripted):
    # ids strictly above EOS must NOT terminate decoding
    script = [[FILL], [FILL], [6], [EOS], [0], [0]]
    scripted(script)
    tokens, lengths = _decode(script, len(script))
    assert np.asarray(lengths).tolist() == [1]
    assert np.asarray(tokens)[0, 0] == 6


def test_chunk_decode_counts_steps_not_emissions(scripted):
    # target_step is in decode steps; specials consume steps without emitting
    script = [[5], [FILL], [7], [FILL], [9], [EOS]]
    scripted(script)
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    p_bucket = 8
    ids = jnp.zeros((1, p_bucket), jnp.int32)
    src = jnp.zeros((1, p_bucket), jnp.int32)
    pl = jnp.full((1,), 4, jnp.int32)
    mn = jnp.zeros((1,), jnp.int32)
    mx = jnp.full((1,), 6, jnp.int32)
    st = llm_mod.lm_prefill(params, CFG, ids, src, pl, jax.random.key(1), 6)
    st = llm_mod.lm_decode_chunk(params, CFG, st, pl, mn, mx, p_bucket, jnp.asarray(4))
    # after 4 steps: emitted [5, 7], two FILLs consumed steps only
    assert int(st.step) == 4
    assert int(st.lengths[0]) == 2
    assert np.asarray(st.tokens)[0, :2].tolist() == [5, 7]
    # continue to the end: EOS finishes
    st = llm_mod.lm_decode_chunk(params, CFG, st, pl, mn, mx, p_bucket, jnp.asarray(6))
    assert bool(st.finished[0])
    assert int(st.lengths[0]) == 3
    assert np.asarray(st.tokens)[0, :3].tolist() == [5, 7, 9]
