"""ASR-style decoder + MoE FFN: parity vs the reference torch modules
(cosy_repo/cosyvoice/transformer/decoder.py, positionwise_feed_forward.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import AsrDecoderConfig
from cosyvoice2_eu_tpu.models.decoder import (
    bi_transformer_decoder_forward,
    convert_bi_transformer_decoder,
    convert_moe_ffn,
    convert_transformer_decoder,
    decoder_forward_one_step,
    moe_ffn,
    transformer_decoder_forward,
)
from cosyvoice2_eu_tpu.runtime import refverify as rv

pytestmark = pytest.mark.skipif(
    not rv.reference_available(), reason="reference checkout not present"
)

TINY = dict(vocab_size=40, encoder_output_size=32, attention_heads=2,
            linear_units=48, num_blocks=2)


def _build_ref_decoder(cfg: AsrDecoderConfig, bi: bool = False, seed: int = 0):
    rv.install_reference()
    import torch
    from cosyvoice.transformer.decoder import BiTransformerDecoder, TransformerDecoder

    torch.manual_seed(seed)
    kw = dict(
        vocab_size=cfg.vocab_size,
        encoder_output_size=cfg.encoder_output_size,
        attention_heads=cfg.attention_heads,
        linear_units=cfg.linear_units,
        num_blocks=cfg.num_blocks,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        input_layer=cfg.input_layer,
        use_output_layer=cfg.use_output_layer,
        normalize_before=cfg.normalize_before,
        key_bias=cfg.key_bias,
    )
    if bi:
        return BiTransformerDecoder(r_num_blocks=cfg.r_num_blocks, **kw).eval()
    return TransformerDecoder(src_attention=cfg.src_attention,
                              activation_type=cfg.activation_type, **kw).eval()


def _data(cfg, b=2, l=7, t_mem=11, seed=1):
    rng = np.random.default_rng(seed)
    memory = rng.standard_normal((b, t_mem, cfg.encoder_output_size)).astype(np.float32)
    mem_lens = np.array([t_mem, t_mem - 4][:b], np.int32)
    ys = rng.integers(0, cfg.vocab_size, (b, l)).astype(np.int64)
    ys_lens = np.array([l, l - 2][:b], np.int32)
    return memory, mem_lens, ys, ys_lens


@pytest.mark.parametrize("over", [
    dict(),
    dict(normalize_before=False),
    dict(src_attention=False),
    dict(use_output_layer=False),
])
def test_transformer_decoder_parity(over):
    import torch

    cfg = AsrDecoderConfig(**TINY, **over)
    ref = _build_ref_decoder(cfg)
    params = convert_transformer_decoder(rv.state_dict_numpy(ref), cfg)
    memory, mem_lens, ys, ys_lens = _data(cfg)
    mem_mask = torch.arange(memory.shape[1])[None] < torch.from_numpy(mem_lens)[:, None]
    with torch.no_grad():
        want, _, _ = ref(torch.from_numpy(memory), mem_mask.unsqueeze(1),
                         torch.from_numpy(ys), torch.from_numpy(ys_lens))
    got, _ = transformer_decoder_forward(params, cfg, jnp.asarray(memory),
                                         jnp.asarray(mem_lens), jnp.asarray(ys),
                                         jnp.asarray(ys_lens))
    for i, n in enumerate(ys_lens):
        err = np.abs(np.asarray(got)[i, :n] - want.numpy()[i, :n]).max()
        assert err < 2e-4, f"row {i}: {err}"


def test_forward_one_step_parity():
    import torch

    cfg = AsrDecoderConfig(**TINY)
    ref = _build_ref_decoder(cfg)
    params = convert_transformer_decoder(rv.state_dict_numpy(ref), cfg)
    memory, mem_lens, ys, _ = _data(cfg, b=1, l=5)
    mem_mask = (torch.ones(1, 1, memory.shape[1], dtype=torch.bool))
    t_cache, j_cache = None, None
    for step in range(1, ys.shape[1] + 1):
        tgt = ys[:, :step]
        causal = torch.tril(torch.ones(step, step, dtype=torch.bool))[None]
        with torch.no_grad():
            want, t_cache = ref.forward_one_step(
                torch.from_numpy(memory), mem_mask, torch.from_numpy(tgt),
                causal, t_cache)
        got, j_cache = decoder_forward_one_step(
            params, cfg, jnp.asarray(memory),
            jnp.asarray([memory.shape[1]], jnp.int32), jnp.asarray(tgt), j_cache)
        err = np.abs(np.asarray(got) - want.numpy()).max()
        assert err < 2e-4, f"step {step}: {err}"


def test_bi_decoder_parity():
    import torch

    cfg = AsrDecoderConfig(**TINY, r_num_blocks=1)
    ref = _build_ref_decoder(cfg, bi=True)
    params = convert_bi_transformer_decoder(rv.state_dict_numpy(ref), cfg)
    memory, mem_lens, ys, ys_lens = _data(cfg)
    r_ys = np.ascontiguousarray(ys[:, ::-1])
    mem_mask = torch.arange(memory.shape[1])[None] < torch.from_numpy(mem_lens)[:, None]
    with torch.no_grad():
        want_l, want_r, _ = ref(torch.from_numpy(memory), mem_mask.unsqueeze(1),
                                torch.from_numpy(ys), torch.from_numpy(ys_lens),
                                torch.from_numpy(r_ys), reverse_weight=0.3)
    got_l, got_r, _ = bi_transformer_decoder_forward(
        params, cfg, jnp.asarray(memory), jnp.asarray(mem_lens),
        jnp.asarray(ys), jnp.asarray(ys_lens), jnp.asarray(r_ys), reverse_weight=0.3)
    for i, n in enumerate(ys_lens):
        assert np.abs(np.asarray(got_l)[i, :n] - want_l.numpy()[i, :n]).max() < 2e-4
        assert np.abs(np.asarray(got_r)[i, :n] - want_r.numpy()[i, :n]).max() < 2e-4


def test_moe_ffn_parity():
    rv.install_reference()
    import torch
    from cosyvoice.transformer.positionwise_feed_forward import MoEFFNLayer

    torch.manual_seed(3)
    n_expert, k, d, h = 4, 2, 16, 24
    ref = MoEFFNLayer(n_expert, k, d, h, dropout_rate=0.0).eval()
    params = convert_moe_ffn(rv.state_dict_numpy(ref), n_expert)
    x = np.random.default_rng(4).standard_normal((2, 5, d)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = moe_ffn(params, jnp.asarray(x), k)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
