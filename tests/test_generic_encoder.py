"""Generic encoder family: activation parity vs the reference torch zoo.

Covers the §2.3 matrix — Transformer/Conformer encoders, all subsampling
variants, positional-encoding variants, the ConvolutionModule (causal and
not, batch_norm and layer_norm), macaron FFN, and the KV-cached chunk
streaming path — against the ACTUAL reference modules
(cosy_repo/cosyvoice/transformer/encoder.py) built at tiny sizes.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import GenericEncoderConfig
from cosyvoice2_eu_tpu.models.generic_encoder import (
    convert_generic_encoder,
    generic_encoder_forward,
    generic_encoder_forward_chunk,
    generic_encoder_forward_chunk_by_chunk,
    init_chunk_state,
    init_generic_encoder,
    subsample_info,
)
from cosyvoice2_eu_tpu.runtime import refverify as rv

pytestmark = pytest.mark.skipif(
    not rv.reference_available(), reason="reference checkout not present"
)

TINY = dict(input_size=16, output_size=32, attention_heads=2, linear_units=48,
            num_blocks=2, max_len=512)


def _torch_kwargs(cfg: GenericEncoderConfig) -> dict:
    kw = dict(
        input_size=cfg.vocab_size if cfg.input_layer == "embed" else cfg.input_size,
        output_size=cfg.output_size,
        attention_heads=cfg.attention_heads,
        linear_units=cfg.linear_units,
        num_blocks=cfg.num_blocks,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        input_layer=cfg.input_layer,
        pos_enc_layer_type=cfg.pos_enc_layer_type,
        normalize_before=cfg.normalize_before,
        static_chunk_size=cfg.static_chunk_size,
        use_dynamic_chunk=False,
        key_bias=cfg.key_bias,
        selfattention_layer_type=cfg.selfattention_layer_type,
        activation_type=cfg.activation_type,
    )
    if cfg.arch == "conformer":
        kw.update(
            macaron_style=cfg.macaron_style,
            use_cnn_module=cfg.use_cnn_module,
            cnn_module_kernel=cfg.cnn_module_kernel,
            cnn_module_norm=cfg.cnn_module_norm,
            causal=cfg.causal,
        )
    return kw


def _build_pair(cfg: GenericEncoderConfig, seed: int = 0):
    """Reference torch encoder (random init, eval) + converted JAX params."""
    rv.install_reference()
    import torch
    from cosyvoice.transformer.encoder import ConformerEncoder, TransformerEncoder

    torch.manual_seed(seed)
    cls = ConformerEncoder if cfg.arch == "conformer" else TransformerEncoder
    ref = cls(**_torch_kwargs(cfg)).eval()
    with torch.no_grad():
        # learnable PE starts from torch.empty — give it real values
        if cfg.pos_enc_layer_type == "embed_learnable_pe":
            ref.embed.pos_enc.pe.data.normal_(0.0, 0.02)
        # make running BN stats non-trivial so conversion is actually tested
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    params = convert_generic_encoder(rv.state_dict_numpy(ref), cfg)
    return ref, params


def _inputs(cfg: GenericEncoderConfig, b: int, t: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    if cfg.input_layer == "embed":
        xs = rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int64)
    else:
        xs = rng.standard_normal((b, t, cfg.input_size)).astype(np.float32)
    lens = np.full((b,), t, np.int32)
    if b > 1:
        lens[-1] = t - 3 * subsample_info(cfg.input_layer)[0]
    return xs, lens


def _assert_forward_parity(cfg: GenericEncoderConfig, b=2, t=29, atol=2e-4,
                           decoding_chunk_size=0, num_left=-1):
    import torch

    ref, params = _build_pair(cfg)
    xs, lens = _inputs(cfg, b, t)
    with torch.no_grad():
        want, want_mask = ref(torch.from_numpy(xs), torch.from_numpy(lens),
                              decoding_chunk_size, num_left)
    got, got_mask = generic_encoder_forward(
        params, cfg, jnp.asarray(xs), jnp.asarray(lens),
        decoding_chunk_size, num_left)
    want_valid = want_mask[:, 0].numpy()
    np.testing.assert_array_equal(np.asarray(got_mask), want_valid)
    for i in range(b):
        n = int(want_valid[i].sum())
        err = np.abs(np.asarray(got)[i, :n] - want.numpy()[i, :n]).max()
        assert err < atol, f"row {i}: max err {err}"


def test_conformer_full_stack_parity():
    """Defaults: conv2d subsample, espnet rel pos, macaron, CNN batch_norm."""
    cfg = GenericEncoderConfig(**TINY, input_layer="conv2d")
    _assert_forward_parity(cfg, t=37)


def test_conformer_causal_layernorm_chunked_parity():
    """Causal depthwise conv + layer_norm CNN + static chunk masks."""
    cfg = GenericEncoderConfig(
        **TINY, input_layer="linear", causal=True, cnn_module_norm="layer_norm",
        cnn_module_kernel=7, static_chunk_size=4,
    )
    _assert_forward_parity(cfg, t=19)


def test_conformer_postln_no_cnn_parity():
    """normalize_before=False, no CNN module, no macaron, legacy rel_pos."""
    cfg = GenericEncoderConfig(
        **TINY, input_layer="linear_legacy", normalize_before=False,
        use_cnn_module=False, macaron_style=False, pos_enc_layer_type="rel_pos",
    )
    _assert_forward_parity(cfg, t=21)


def test_transformer_abs_pos_parity():
    cfg = GenericEncoderConfig(
        **TINY, arch="transformer", input_layer="linear",
        pos_enc_layer_type="abs_pos", selfattention_layer_type="selfattn",
        activation_type="relu",
    )
    _assert_forward_parity(cfg, t=23)


def test_whisper_style_parity():
    """conv1d2 subsampling + whisper sinusoids + no key bias + gelu."""
    cfg = GenericEncoderConfig(
        **TINY, arch="transformer", input_layer="conv1d2",
        pos_enc_layer_type="abs_pos_whisper", selfattention_layer_type="selfattn",
        activation_type="gelu", key_bias=False,
    )
    _assert_forward_parity(cfg, t=30)


def test_embed_learnable_pe_parity():
    cfg = GenericEncoderConfig(
        **TINY, arch="transformer", input_layer="embed", vocab_size=50,
        pos_enc_layer_type="embed_learnable_pe", selfattention_layer_type="selfattn",
    )
    _assert_forward_parity(cfg, t=18)


@pytest.mark.parametrize("kind,t", [("conv2d6", 43), ("conv2d8", 51)])
def test_deep_subsampling_parity(kind, t):
    cfg = GenericEncoderConfig(**TINY, input_layer=kind)
    _assert_forward_parity(cfg, t=t)


def test_no_pos_parity():
    cfg = GenericEncoderConfig(
        **TINY, arch="transformer", input_layer="linear",
        pos_enc_layer_type="no_pos", selfattention_layer_type="selfattn",
    )
    _assert_forward_parity(cfg, t=17)


# ---------------------------------------------------------------------------
# streaming chunk path
# ---------------------------------------------------------------------------

def _chunk_cfg(**over) -> GenericEncoderConfig:
    base = dict(
        **TINY, input_layer="linear", pos_enc_layer_type="rel_pos",
        static_chunk_size=4, causal=True, cnn_module_kernel=7,
    )
    base.update(over)
    return GenericEncoderConfig(**base)


@pytest.mark.parametrize("cfg,label", [
    (_chunk_cfg(), "conformer-relpos-causal"),
    (_chunk_cfg(arch="transformer", selfattention_layer_type="selfattn",
                pos_enc_layer_type="abs_pos", activation_type="relu"),
     "transformer-abspos"),
    (_chunk_cfg(input_layer="conv2d"), "conformer-conv2d"),
])
def test_forward_chunk_by_chunk_parity(cfg, label):
    """Streaming (fixed right-aligned KV window) == the reference's
    dynamically-growing forward_chunk_by_chunk, chunk for chunk."""
    import torch

    ref, params = _build_pair(cfg)
    sub, _ = subsample_info(cfg.input_layer)
    t = 4 * 4 * sub + subsample_info(cfg.input_layer)[1] + 1  # 4 full chunks
    xs = np.random.default_rng(2).standard_normal((1, t, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref.forward_chunk_by_chunk(torch.from_numpy(xs), 4, 2)
    got, _ = generic_encoder_forward_chunk_by_chunk(params, cfg, jnp.asarray(xs), 4, 2)
    assert got.shape == tuple(want.shape), (got.shape, want.shape)
    err = np.abs(np.asarray(got) - want.numpy()).max()
    assert err < 2e-4, f"{label}: max err {err}"


def test_unlimited_left_context_past_16_chunks():
    """num_decoding_left_chunks=-1 must keep ALL left context however long
    the utterance is (the old code silently capped the cache at 16 chunks,
    diverging from the reference beyond that)."""
    import torch

    cfg = _chunk_cfg(arch="transformer", selfattention_layer_type="selfattn",
                     pos_enc_layer_type="abs_pos", activation_type="relu")
    ref, params = _build_pair(cfg)
    sub, rc = subsample_info(cfg.input_layer)
    n_chunks = 20
    t = n_chunks * 4 * sub + rc + 1
    xs = np.random.default_rng(5).standard_normal((1, t, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref.forward_chunk_by_chunk(torch.from_numpy(xs), 4, -1)
    got, _ = generic_encoder_forward_chunk_by_chunk(params, cfg, jnp.asarray(xs), 4, -1)
    assert got.shape == tuple(want.shape), (got.shape, want.shape)
    err = np.abs(np.asarray(got) - want.numpy()).max()
    assert err < 5e-4, f"max err {err} (left-context truncated?)"


def test_chunk_streaming_matches_chunked_full_forward():
    """Self-consistency (no reference needed): streaming with unlimited-fill
    cache == full forward under the matching chunk mask."""
    cfg = _chunk_cfg()
    params = init_generic_encoder(jax.random.PRNGKey(0), cfg)
    t = 16
    xs = np.random.default_rng(3).standard_normal((1, t, cfg.input_size)).astype(np.float32)
    full, _ = generic_encoder_forward(params, cfg, jnp.asarray(xs),
                                      jnp.asarray([t], jnp.int32),
                                      decoding_chunk_size=4,
                                      num_decoding_left_chunks=-1)
    stream, _ = generic_encoder_forward_chunk_by_chunk(params, cfg, jnp.asarray(xs), 4, -1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full), atol=2e-4)


def test_chunk_state_is_shape_static():
    """Every streaming step reuses one compiled program (the point of the
    fixed-width cache design)."""
    cfg = _chunk_cfg()
    params = init_generic_encoder(jax.random.PRNGKey(1), cfg)
    state = init_chunk_state(cfg, cache_t=8, batch=1)
    step = jax.jit(lambda s, c: generic_encoder_forward_chunk(params, cfg, s, c))
    chunk = jnp.asarray(np.random.default_rng(4).standard_normal((1, 4, cfg.input_size)),
                        jnp.float32)
    y, state = step(state, chunk)
    n0 = step._cache_size()
    for _ in range(3):
        y, state = step(state, chunk)
    assert step._cache_size() == n0 == 1
    assert y.shape == (1, 4, cfg.output_size)


def test_espnet_relpos_streaming_rejected():
    cfg = GenericEncoderConfig(**TINY, input_layer="linear")
    with pytest.raises(ValueError, match="rel_pos_espnet"):
        init_chunk_state(cfg, cache_t=8)
