"""Bistream (streaming text input) decode: protocol and consistency."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import tiny_test_config
from cosyvoice2_eu_tpu.models import llm as llm_mod

CFG = tiny_test_config().llm


def test_bs_extend_matches_prefill():
    """Cursor-based segment appends must equal a single prefill."""
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 100, 12).astype(np.int32)

    # one-shot prefill reference
    P = 16
    ids_p = np.zeros((1, P), np.int32)
    src_p = np.zeros((1, P), np.int32)
    ids_p[0, :12], src_p[0, :12] = ids, llm_mod.SRC_TEXT
    full_state = llm_mod.lm_prefill(
        params, CFG, jnp.asarray(ids_p), jnp.asarray(src_p), jnp.asarray([12]),
        jax.random.key(1), max_gen=8,
    )

    # two cursor appends: 5 then 7 tokens
    st = llm_mod.bs_init(params, CFG, max_cache=24)
    seg1 = np.zeros((1, 8), np.int32)
    seg1[0, :5] = ids[:5]
    st = llm_mod.bs_extend(params, CFG, st, jnp.asarray(seg1),
                           jnp.full((1, 8), llm_mod.SRC_TEXT, np.int32), jnp.asarray(5))
    seg2 = np.zeros((1, 8), np.int32)
    seg2[0, :7] = ids[5:]
    st = llm_mod.bs_extend(params, CFG, st, jnp.asarray(seg2),
                           jnp.full((1, 8), llm_mod.SRC_TEXT, np.int32), jnp.asarray(7))

    assert int(st.cache_len) == 12
    np.testing.assert_allclose(
        np.asarray(st.last_hidden), np.asarray(full_state.last_hidden), atol=2e-4, rtol=1e-3
    )


def test_bistream_generator_yields_tokens():
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    rng = np.random.default_rng(1)
    prompt_text = rng.integers(2, 100, 6).astype(np.int32)
    prompt_speech = rng.integers(0, CFG.speech_token_size, 18).astype(np.int32)

    def text_chunks():
        # 4 chunks of 5 text tokens
        for _ in range(4):
            yield rng.integers(2, 100, 5).astype(np.int32)

    tokens = []
    for t in llm_mod.lm_inference_bistream(
        params, CFG, text_chunks(), prompt_text, prompt_speech,
        jax.random.key(2), max_cache=256, chunk_capacity=16,
    ):
        tokens.append(t)
        if len(tokens) >= 40:  # random weights may never emit EOS
            break
    assert len(tokens) > 0
    assert all(0 <= t < CFG.speech_token_size for t in tokens)


@pytest.mark.slow
def test_bistream_through_public_api(tmp_path):
    """--backbone routing: a non-BlankEN HF backbone sends tts()/stream()
    through the bistream fill-token protocol, and stream_text() accepts
    incremental text (reference llm.py:575-609).  Drives the real public
    surface: load(backbone=...) -> Cosy2EU.tts/.stream/.stream_text."""
    import dataclasses
    import json

    import cosyvoice2_eu_tpu as cosy

    cfg = tiny_test_config()
    bb = cfg.llm.backbone
    # a local HF-style checkout: config.json describing the tiny backbone
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "qwen2",
        "vocab_size": bb.vocab_size,
        "hidden_size": bb.hidden_size,
        "intermediate_size": bb.intermediate_size,
        "num_hidden_layers": bb.num_layers,
        "num_attention_heads": bb.num_heads,
        "num_key_value_heads": bb.num_kv_heads,
        "head_dim": bb.head_dim,
        "rope_theta": 1000000.0,
    }))
    model = cosy.load(config=cfg, backbone=f"local:{tmp_path}", seed=0)
    assert model._model.use_bistream

    rng = np.random.default_rng(0)
    n_sp = 18
    prompt = {
        "prompt_feat": rng.standard_normal((n_sp * 2, cfg.flow.output_size)).astype(np.float32),
        "speech_tokens": rng.integers(0, cfg.llm.speech_token_size, n_sp).astype(np.int32),
        "embedding": rng.standard_normal(cfg.frontend.spk_embed_dim).astype(np.float32),
        "prompt_text": "bonjour",
    }
    wav, sr = model.tts("bonjour le monde", prompt, mode="zero_shot")
    assert wav.shape[0] == 1 and wav.shape[1] > 0 and np.isfinite(wav).all()

    chunks = list(model.stream("hallo welt", prompt, mode="zero_shot"))
    assert chunks and all(c.shape[0] == 1 for c in chunks)

    # streaming TEXT input
    pieces = iter(["bonjour ", "tout le ", "monde"])
    out = list(model.stream_text(pieces, prompt, prompt_text="bonjour"))
    assert out and all(np.isfinite(c).all() for c in out)
