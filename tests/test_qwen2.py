"""Qwen2 backbone parity vs HF transformers (torch CPU) + decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cosyvoice2_eu_tpu.config import LMConfig, Qwen2Config, tiny_test_config
from cosyvoice2_eu_tpu.models import llm as llm_mod
from cosyvoice2_eu_tpu.models.qwen2 import (
    KVCache,
    init_qwen2,
    qwen2_decode_step,
    qwen2_forward,
    qwen2_prefill,
)

CFG = Qwen2Config(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
)


@pytest.fixture(scope="module")
def params():
    return init_qwen2(jax.random.key(0), CFG)


def _to_hf(params):
    from transformers import Qwen2Config as HFConfig
    from transformers.models.qwen2.modeling_qwen2 import Qwen2Model

    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        attn_implementation="eager",
    )
    model = Qwen2Model(hf_cfg)
    sd = {}
    sd["embed_tokens.weight"] = params["embed_tokens"]["weight"]
    sd["norm.weight"] = params["norm"]["weight"]
    for i, lp in enumerate(params["layers"]):
        pre = f"layers.{i}."
        sd[pre + "input_layernorm.weight"] = lp["input_layernorm"]["weight"]
        sd[pre + "post_attention_layernorm.weight"] = lp["post_attention_layernorm"]["weight"]
        for name in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            sd[pre + f"self_attn.{name}.weight"] = lp[name]["weight"]
            if "bias" in lp[name]:
                sd[pre + f"self_attn.{name}.bias"] = lp[name]["bias"]
        for name in ["gate_proj", "up_proj", "down_proj"]:
            sd[pre + f"mlp.{name}.weight"] = lp[name]["weight"]
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model


def test_forward_matches_hf(params):
    hf = _to_hf(params)
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((2, 11, CFG.hidden_size)).astype(np.float32) * 0.05
    valid = np.ones((2, 11), bool)
    valid[1, 8:] = False

    ours = qwen2_forward(params, CFG, jnp.asarray(embeds), jnp.asarray(valid))
    with torch.no_grad():
        theirs = hf(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(valid.astype(np.int64)),
        ).last_hidden_state
    # compare only valid positions
    np.testing.assert_allclose(
        np.asarray(ours)[valid], theirs.numpy()[valid], atol=2e-4, rtol=1e-3
    )


def test_prefill_plus_decode_matches_full_forward(params):
    rng = np.random.default_rng(1)
    T, P = 9, 6
    embeds = (rng.standard_normal((1, T, CFG.hidden_size)) * 0.05).astype(np.float32)
    valid = np.ones((1, T), bool)
    full = np.asarray(qwen2_forward(params, CFG, jnp.asarray(embeds), jnp.asarray(valid)))

    # prefill bucket = 8 with actual prompt length 6, then decode 3 tokens
    bucket = 8
    padded = np.zeros((1, bucket, CFG.hidden_size), np.float32)
    padded[:, :P] = embeds[:, :P]
    kv = KVCache.zeros(CFG, 1, bucket + 4, dtype=jnp.float32)
    last, kv = qwen2_prefill(params, CFG, jnp.asarray(padded), jnp.asarray([P]), kv)
    np.testing.assert_allclose(np.asarray(last)[0], full[0, P - 1], atol=1e-4, rtol=1e-3)

    slot = np.arange(bucket + 4)
    for step in range(T - P):
        cache_index = bucket + step
        visible = (slot < P) | ((slot >= bucket) & (slot <= cache_index))
        hidden, kv = qwen2_decode_step(
            params,
            CFG,
            jnp.asarray(embeds[:, P + step]),
            jnp.asarray([P + step]),
            cache_index,
            jnp.asarray(visible[None]),
            kv,
        )
        np.testing.assert_allclose(
            np.asarray(hidden)[0], full[0, P + step], atol=1e-4, rtol=1e-3
        )


def test_lm_decode_shapes_and_stop():
    cfg = tiny_test_config().llm
    params = llm_mod.init_lm(jax.random.key(0), cfg)

    P = 32
    ids = np.zeros((1, P), np.int32)
    src = np.zeros((1, P), np.int32)
    # [sos, 5 text tokens, task, 4 prompt speech]
    ids[0, 0], src[0, 0] = cfg.sos_eos, llm_mod.SRC_SPECIAL
    ids[0, 1:6], src[0, 1:6] = [3, 4, 5, 6, 7], llm_mod.SRC_TEXT
    ids[0, 6], src[0, 6] = cfg.task_id, llm_mod.SRC_SPECIAL
    ids[0, 7:11], src[0, 7:11] = [10, 11, 12, 13], llm_mod.SRC_SPEECH
    prompt_len = jnp.asarray([11])

    tokens, lengths = jax.jit(
        lambda i, s, pl, mn, mx, r: llm_mod.lm_decode(
            params, cfg, i, s, pl, mn, mx, r, max_gen=64
        )
    )(
        jnp.asarray(ids),
        jnp.asarray(src),
        prompt_len,
        jnp.asarray([10]),
        jnp.asarray([40]),
        jax.random.key(1),
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    assert tokens.shape == (1, 64)
    assert 10 <= lengths[0] <= 40
    assert (tokens[0, : lengths[0]] < cfg.eos_token).all()
    assert (tokens[0, lengths[0] :] == 0).all()


def test_qwen3_style_forward_matches_hf():
    """qk-norm + no-bias attention (Qwen3 backbone support)."""
    from transformers.models.qwen3.modeling_qwen3 import Qwen3Model
    from transformers import Qwen3Config as HF3Config

    cfg3 = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        use_qk_norm=True, attention_bias=False,
    )
    params = init_qwen2(jax.random.key(3), cfg3)

    hf_cfg = HF3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=cfg3.rms_norm_eps, rope_theta=cfg3.rope_theta,
        attn_implementation="eager",
    )
    model = Qwen3Model(hf_cfg)
    sd = {
        "embed_tokens.weight": params["embed_tokens"]["weight"],
        "norm.weight": params["norm"]["weight"],
    }
    for i, lp in enumerate(params["layers"]):
        pre = f"layers.{i}."
        sd[pre + "input_layernorm.weight"] = lp["input_layernorm"]["weight"]
        sd[pre + "post_attention_layernorm.weight"] = lp["post_attention_layernorm"]["weight"]
        for name in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            sd[pre + f"self_attn.{name}.weight"] = lp[name]["weight"]
        sd[pre + "self_attn.q_norm.weight"] = lp["q_norm"]["weight"]
        sd[pre + "self_attn.k_norm.weight"] = lp["k_norm"]["weight"]
        for name in ["gate_proj", "up_proj", "down_proj"]:
            sd[pre + f"mlp.{name}.weight"] = lp[name]["weight"]
    model.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=True)
    model.eval()

    rng = np.random.default_rng(5)
    embeds = rng.standard_normal((1, 9, 64)).astype(np.float32) * 0.05
    valid = np.ones((1, 9), bool)
    ours = qwen2_forward(params, cfg3, jnp.asarray(embeds), jnp.asarray(valid))
    with torch.no_grad():
        theirs = model(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-4, rtol=1e-3)


def test_lm_decode_int8_quantized_path():
    """load(lm_quant='int8') serving lever: decode runs on weight-only int8
    projections and emits in-vocab tokens; logits stay close to bf16."""
    from cosyvoice2_eu_tpu.utils.params import quantize_lm_params

    cfg = tiny_test_config().llm
    params = llm_mod.init_lm(jax.random.key(0), cfg)
    params_q = quantize_lm_params(params)
    # every projection got the int8 form
    lp = params_q["backbone"]["layers"][0]
    assert "weight_q" in lp["q_proj"] and lp["q_proj"]["weight_q"].dtype == jnp.int8
    assert "weight_q" in params_q["llm_decoder"]

    P = 32
    ids = np.zeros((1, P), np.int32)
    src = np.zeros((1, P), np.int32)
    ids[0, 0], src[0, 0] = cfg.sos_eos, llm_mod.SRC_SPECIAL
    ids[0, 1:6], src[0, 1:6] = [3, 4, 5, 6, 7], llm_mod.SRC_TEXT
    ids[0, 6], src[0, 6] = cfg.task_id, llm_mod.SRC_SPECIAL
    args = (jnp.asarray(ids), jnp.asarray(src), jnp.asarray([7]),
            jnp.asarray([8]), jnp.asarray([32]), jax.random.key(1))

    def decode(pp, *a):
        return llm_mod.lm_decode(pp, cfg, *a, max_gen=64)

    tokens, lengths = jax.jit(decode)(params_q, *args)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    assert 8 <= lengths[0] <= 32
    assert (tokens[0, : lengths[0]] < cfg.eos_token).all()
