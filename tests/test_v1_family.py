"""v1 model family: activation parity vs the reference torch modules.

Covers MaskedDiffWithXvec (flow/flow.py:24), InterpolateRegulator
(flow/length_regulator.py:21), ConditionalDecoder (flow/decoder.py:88) and
TransformerLM (llm/llm.py:120) — random-initialized reference modules
converted through the production v1 converters (runtime/checkpoint_v1.py)
and compared activation-for-activation, the same scheme as
tests/test_ref_parity.py uses for the v2 family.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import (
    CFMConfig,
    EstimatorV1Config,
    FlowV1Config,
    GenericEncoderConfig,
    LengthRegulatorConfig,
    LMV1Config,
)
from cosyvoice2_eu_tpu.runtime import refverify as rv

pytestmark = pytest.mark.skipif(
    not rv.reference_available(), reason="reference checkout not present"
)

MELS = 8  # tiny mel width (everything scales off output_size)


def _tiny_estimator_cfg(mels: int = MELS) -> EstimatorV1Config:
    return EstimatorV1Config(
        in_channels=4 * mels, out_channels=mels, channels=(16, 16),
        attention_head_dim=4, n_blocks=1, num_mid_blocks=2, num_heads=2,
    )


def _build_ref_estimator(cfg: EstimatorV1Config, seed=0):
    rv.install_reference()
    import torch
    from cosyvoice.flow.decoder import ConditionalDecoder

    torch.manual_seed(seed)
    ref = ConditionalDecoder(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        channels=list(cfg.channels), dropout=0.0,
        attention_head_dim=cfg.attention_head_dim, n_blocks=cfg.n_blocks,
        num_mid_blocks=cfg.num_mid_blocks, num_heads=cfg.num_heads,
        act_fn=cfg.act_fn,
    ).eval()
    return ref


def test_estimator_v1_parity():
    import torch

    from cosyvoice2_eu_tpu.models.estimator_v1 import estimator_v1_forward
    from cosyvoice2_eu_tpu.runtime.checkpoint_v1 import convert_estimator_v1

    cfg = _tiny_estimator_cfg()
    ref = _build_ref_estimator(cfg)
    params = convert_estimator_v1(rv.state_dict_numpy(ref), cfg)

    rng = np.random.default_rng(0)
    b, T = 2, 16  # T even: survives the stride-2 down / transpose-conv up
    x = rng.standard_normal((b, MELS, T)).astype(np.float32)
    mu = rng.standard_normal((b, MELS, T)).astype(np.float32)
    spks = rng.standard_normal((b, MELS)).astype(np.float32)
    cond = rng.standard_normal((b, MELS, T)).astype(np.float32)
    mask = np.ones((b, 1, T), np.float32)
    t = np.asarray([0.3, 0.7], np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(mu),
            torch.from_numpy(t), torch.from_numpy(spks), torch.from_numpy(cond),
        ).numpy()
    got = np.asarray(estimator_v1_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(mu),
        jnp.asarray(t), jnp.asarray(spks), jnp.asarray(cond),
    ))
    err = np.abs(got - want).max()
    assert err < 2e-4, f"max err {err}"


def test_length_regulator_parity():
    import torch

    from cosyvoice2_eu_tpu.models.length_regulator import (
        init_length_regulator,
        length_regulator_forward,
        length_regulator_inference,
    )
    from cosyvoice2_eu_tpu.runtime.checkpoint_v1 import convert_length_regulator

    rv.install_reference()
    from cosyvoice.flow.length_regulator import InterpolateRegulator

    cfg = LengthRegulatorConfig(channels=MELS, sampling_ratios=(1, 1))
    torch.manual_seed(1)
    ref = InterpolateRegulator(channels=MELS, sampling_ratios=(1, 1)).eval()
    params = convert_length_regulator(rv.state_dict_numpy(ref), cfg)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 50, MELS)).astype(np.float32)
    out_len = 86
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x), torch.tensor([out_len]))
    got = length_regulator_forward(
        params, cfg, jnp.asarray(x), out_len,
        jnp.ones((1, out_len), bool),
    )
    err = np.abs(np.asarray(got) - want.numpy()).max()
    assert err < 1e-4, f"forward: max err {err}"

    # inference: the >40-token head/mid/tail split AND the short path
    for t2 in (50, 30):
        x1 = rng.standard_normal((1, 12, MELS)).astype(np.float32)
        x2 = rng.standard_normal((1, t2, MELS)).astype(np.float32)
        mel1, mel2 = 20, int(t2 / 50 * 22050 / 256)
        with torch.no_grad():
            want, _ = ref.inference(
                torch.from_numpy(x1), torch.from_numpy(x2), mel1, mel2,
                input_frame_rate=50,
            )
        got = length_regulator_inference(
            params, cfg, jnp.asarray(x1), jnp.asarray(x2), mel1, mel2, 50,
        )
        err = np.abs(np.asarray(got) - want.numpy()).max()
        assert err < 1e-4, f"inference t2={t2}: max err {err}"


def _tiny_flow_cfg(mels: int = MELS) -> FlowV1Config:
    enc = GenericEncoderConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=1, arch="conformer", input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False, max_len=512,
    )
    return FlowV1Config(
        input_size=16, output_size=mels, spk_embed_dim=12, vocab_size=32,
        encoder=enc,
        length_regulator=LengthRegulatorConfig(channels=mels, sampling_ratios=(1, 1)),
        estimator=_tiny_estimator_cfg(mels),
        cfm=CFMConfig(n_timesteps=2),
    )


def _build_ref_flow(cfg: FlowV1Config, seed=3):
    mels = cfg.output_size
    rv.install_reference()
    import torch
    from omegaconf import DictConfig

    from cosyvoice.flow.decoder import ConditionalDecoder
    from cosyvoice.flow.flow import MaskedDiffWithXvec
    from cosyvoice.flow.flow_matching import ConditionalCFM
    from cosyvoice.flow.length_regulator import InterpolateRegulator
    from cosyvoice.transformer.encoder import ConformerEncoder

    torch.manual_seed(seed)
    encoder = ConformerEncoder(
        input_size=cfg.encoder.input_size, output_size=cfg.encoder.output_size,
        attention_heads=cfg.encoder.attention_heads,
        linear_units=cfg.encoder.linear_units, num_blocks=cfg.encoder.num_blocks,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False,
    )
    estimator = ConditionalDecoder(
        in_channels=cfg.estimator.in_channels, out_channels=cfg.estimator.out_channels,
        channels=list(cfg.estimator.channels), dropout=0.0,
        attention_head_dim=cfg.estimator.attention_head_dim,
        n_blocks=cfg.estimator.n_blocks, num_mid_blocks=cfg.estimator.num_mid_blocks,
        num_heads=cfg.estimator.num_heads, act_fn="gelu",
    )
    decoder = ConditionalCFM(
        in_channels=2 * mels + mels, n_spks=1, spk_emb_dim=mels,
        cfm_params=DictConfig({
            "sigma_min": 1e-6, "solver": "euler", "t_scheduler": "cosine",
            "training_cfg_rate": 0.2, "inference_cfg_rate": 0.7,
            "reg_loss_type": "l1",
        }),
        estimator=estimator,
    )
    ref = MaskedDiffWithXvec(
        input_size=cfg.input_size, output_size=cfg.output_size,
        spk_embed_dim=cfg.spk_embed_dim, vocab_size=cfg.vocab_size,
        input_frame_rate=cfg.input_frame_rate,
        encoder=encoder,
        length_regulator=InterpolateRegulator(
            channels=mels, sampling_ratios=tuple(cfg.length_regulator.sampling_ratios)
        ),
        decoder=decoder,
    ).eval()
    return ref


def test_flow_v1_inference_parity():
    """End to end: tokens -> mel matches the reference MaskedDiffWithXvec
    when both consume the same noise draw (z is injected on both sides)."""
    import torch

    from cosyvoice2_eu_tpu.models.flow_v1 import flow_v1_inference, mel_len_for_tokens
    from cosyvoice2_eu_tpu.runtime.checkpoint_v1 import convert_flow_v1

    # the reference solve_euler hardcodes 80 mel channels
    # (flow_matching.py:94: x_in = torch.zeros([2, 80, T])) — run this one
    # at full mel width with a tiny time axis instead
    mels = 80
    cfg = _tiny_flow_cfg(mels)
    ref = _build_ref_flow(cfg)
    params = convert_flow_v1(rv.state_dict_numpy(ref), cfg)

    rng = np.random.default_rng(4)
    t1, t2 = 6, 50  # t2 > 40 exercises the head/mid/tail regulator split
    token = rng.integers(0, cfg.vocab_size, (1, t2)).astype(np.int64)
    prompt_token = rng.integers(0, cfg.vocab_size, (1, t1)).astype(np.int64)
    mel1 = 10
    prompt_feat = rng.standard_normal((1, mel1, mels)).astype(np.float32)
    emb = rng.standard_normal((1, cfg.spk_embed_dim)).astype(np.float32)
    total = mel1 + mel_len_for_tokens(cfg, t2)
    z = rng.standard_normal((1, mels, total)).astype(np.float32)

    # reference n_timesteps is hardcoded 10 in MaskedDiffWithXvec.inference;
    # match it on our side
    cfg10 = dataclasses.replace(cfg, cfm=dataclasses.replace(cfg.cfm, n_timesteps=10))

    real_randn = torch.randn_like

    def fixed_randn(t, *a, **k):
        if tuple(t.shape) == z.shape:
            return torch.from_numpy(z)
        return real_randn(t, *a, **k)

    torch.randn_like = fixed_randn
    try:
        with torch.no_grad():
            want, _ = ref.inference(
                torch.from_numpy(token), torch.tensor([t2]),
                torch.from_numpy(prompt_token), torch.tensor([t1]),
                torch.from_numpy(prompt_feat), torch.tensor([mel1]),
                torch.from_numpy(emb), torch.zeros(1, mels, 0, 2),
            )
    finally:
        torch.randn_like = real_randn

    got, cache = flow_v1_inference(
        params, cfg10, token, prompt_token, prompt_feat, emb,
        jax.random.key(0), z=z,
    )
    assert got.shape == tuple(want.shape), (got.shape, want.shape)
    err = np.abs(np.asarray(got) - want.numpy()).max()
    assert err < 5e-3, f"max err {err}"
    assert cache.shape == (1, mels, mel1 + 34, 2)


@pytest.mark.slow
def test_flow_v1_loss_finite_and_differentiable():
    from cosyvoice2_eu_tpu.models.flow_v1 import flow_v1_loss, init_flow_v1

    cfg = _tiny_flow_cfg()
    params = init_flow_v1(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    b, tt = 2, 12
    t_mel = 20
    batch = {
        "speech_token": jnp.asarray(rng.integers(0, cfg.vocab_size, (b, tt)), jnp.int32),
        "speech_token_len": jnp.asarray([tt, tt - 3], jnp.int32),
        "speech_feat": jnp.asarray(rng.standard_normal((b, t_mel, MELS)), jnp.float32),
        "speech_feat_len": jnp.asarray([t_mel, t_mel - 5], jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((b, cfg.spk_embed_dim)), jnp.float32),
    }
    loss, grads = jax.value_and_grad(
        lambda p: flow_v1_loss(p, cfg, batch, jax.random.key(1))
    )(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


# ---------------------------------------------------------------------------
# TransformerLM
# ---------------------------------------------------------------------------

def _tiny_lm_cfg() -> LMV1Config:
    text_enc = GenericEncoderConfig(
        input_size=12, output_size=24, attention_heads=2, linear_units=32,
        num_blocks=1, arch="conformer", input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False, static_chunk_size=1, max_len=512,
    )
    llm_enc = GenericEncoderConfig(
        input_size=24, output_size=24, attention_heads=2, linear_units=32,
        num_blocks=2, arch="transformer", input_layer="linear_legacy",
        pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
        activation_type="relu", static_chunk_size=1, max_len=512,
    )
    return LMV1Config(
        text_encoder_input_size=12, llm_input_size=24, llm_output_size=24,
        text_token_size=40, speech_token_size=16, spk_embed_dim=10,
        text_encoder=text_enc, llm=llm_enc,
        top_k=8,  # must be < the tiny 16+1 vocab
    )


def _build_ref_lm(cfg: LMV1Config, seed=7):
    rv.install_reference()
    import torch

    from cosyvoice.llm.llm import TransformerLM
    from cosyvoice.transformer.encoder import ConformerEncoder, TransformerEncoder
    from cosyvoice.utils.common import ras_sampling

    torch.manual_seed(seed)
    text_encoder = ConformerEncoder(
        input_size=cfg.text_encoder.input_size, output_size=cfg.text_encoder.output_size,
        attention_heads=2, linear_units=cfg.text_encoder.linear_units,
        num_blocks=cfg.text_encoder.num_blocks,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        normalize_before=True, input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
        use_cnn_module=False, macaron_style=False, static_chunk_size=1,
    )
    llm = TransformerEncoder(
        input_size=cfg.llm.input_size, output_size=cfg.llm.output_size,
        attention_heads=2, linear_units=cfg.llm.linear_units,
        num_blocks=cfg.llm.num_blocks,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear_legacy", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", static_chunk_size=1,
    )
    ref = TransformerLM(
        text_encoder_input_size=cfg.text_encoder_input_size,
        llm_input_size=cfg.llm_input_size, llm_output_size=cfg.llm_output_size,
        text_token_size=cfg.text_token_size, speech_token_size=cfg.speech_token_size,
        text_encoder=text_encoder, llm=llm, sampling=ras_sampling,
        spk_embed_dim=cfg.spk_embed_dim,
    ).eval()
    return ref


def test_lm_v1_training_parity():
    """Training loss + accuracy match the reference TransformerLM.forward."""
    import torch

    from cosyvoice2_eu_tpu.models.llm_v1 import lm_v1_loss
    from cosyvoice2_eu_tpu.runtime.checkpoint_v1 import convert_llm_v1

    cfg = _tiny_lm_cfg()
    ref = _build_ref_lm(cfg)
    params = convert_llm_v1(rv.state_dict_numpy(ref), cfg)

    rng = np.random.default_rng(8)
    b, tt, ts = 2, 7, 11
    text = rng.integers(1, cfg.text_token_size, (b, tt)).astype(np.int64)
    text_len = np.asarray([tt, tt - 2], np.int32)
    speech = rng.integers(0, cfg.speech_token_size, (b, ts)).astype(np.int64)
    speech_len = np.asarray([ts, ts - 4], np.int32)
    emb = rng.standard_normal((b, cfg.spk_embed_dim)).astype(np.float32)

    with torch.no_grad():
        want = ref(
            {
                "text_token": torch.from_numpy(text),
                "text_token_len": torch.from_numpy(text_len),
                "speech_token": torch.from_numpy(speech),
                "speech_token_len": torch.from_numpy(speech_len),
                "embedding": torch.from_numpy(emb),
            },
            torch.device("cpu"),
        )
    batch = {
        "text_token": jnp.asarray(text, jnp.int32),
        "text_token_len": jnp.asarray(text_len),
        "speech_token": jnp.asarray(speech, jnp.int32),
        "speech_token_len": jnp.asarray(speech_len),
        "embedding": jnp.asarray(emb),
    }
    loss, acc = lm_v1_loss(params, cfg, batch)
    assert abs(float(loss) - float(want["loss"])) < 2e-4, (float(loss), float(want["loss"]))
    assert abs(float(acc) - float(want["acc"])) < 1e-3


def test_lm_v1_incremental_decode_matches_ref_forward_chunk():
    """The static-cache decode step reproduces the reference's growing-cache
    forward_chunk hidden states exactly (prefill + 3 incremental tokens)."""
    import torch

    from cosyvoice2_eu_tpu.models.generic_encoder import convert_generic_encoder
    from cosyvoice2_eu_tpu.models.llm_v1 import _decode_step, _pos_table_positive, _prefill
    from cosyvoice2_eu_tpu.utils.params import dense

    cfg = _tiny_lm_cfg()
    ref = _build_ref_lm(cfg)
    cfg_llm = cfg.llm
    params_llm = convert_generic_encoder(
        {k[len("llm."):]: v for k, v in rv.state_dict_numpy(ref).items()
         if k.startswith("llm.")},
        cfg_llm,
    )

    rng = np.random.default_rng(9)
    L0, D = 9, cfg.llm_input_size
    prefix = rng.standard_normal((1, L0, D)).astype(np.float32)
    extras = rng.standard_normal((3, 1, 1, D)).astype(np.float32)

    # reference: growing cache through forward_chunk (llm.py:316)
    with torch.no_grad():
        att_cache = torch.zeros((0, 0, 0, 0))
        cnn_cache = torch.zeros((0, 0, 0, 0))
        mask = torch.tril(torch.ones((1, L0, L0), dtype=torch.bool))
        y, att_cache, cnn_cache = ref.llm.forward_chunk(
            torch.from_numpy(prefix), offset=0, required_cache_size=-1,
            att_cache=att_cache, cnn_cache=cnn_cache, att_mask=mask,
        )
        want = [y.numpy()]
        offset = L0
        for i in range(3):
            mask1 = torch.ones((1, 1, offset + 1), dtype=torch.bool)
            y, att_cache, cnn_cache = ref.llm.forward_chunk(
                torch.from_numpy(extras[i]), offset=offset, required_cache_size=-1,
                att_cache=att_cache, cnn_cache=cnn_cache, att_mask=mask1,
            )
            want.append(y.numpy())
            offset += 1

    # ours: fixed cache, prefix at slots [0, L0), tokens at [L0, L0+3)
    max_cache = L0 + 3
    k, v, hidden = _prefill(params_llm, cfg_llm, jnp.asarray(prefix),
                            jnp.asarray([L0]), max_cache)
    np.testing.assert_allclose(np.asarray(hidden), want[0], atol=2e-4)

    table = jnp.asarray(_pos_table_positive(max_cache, cfg_llm.output_size))
    h_heads = cfg_llm.attention_heads
    d_k = cfg_llm.output_size // h_heads
    pos_proj = jnp.stack([
        dense(lp["self_attn"]["linear_pos"], table).reshape(-1, h_heads, d_k)
        for lp in params_llm["encoders"]
    ])
    for i in range(3):
        h, k, v = _decode_step(
            params_llm, cfg_llm, pos_proj, jnp.asarray(extras[i]), k, v,
            jnp.asarray([L0]), L0, jnp.asarray(i),
        )
        err = np.abs(np.asarray(h) - want[i + 1][:, 0]).max()
        assert err < 2e-4, f"step {i}: max err {err}"


def test_lm_v1_decode_end_to_end():
    """Full decode produces in-vocab tokens, respects min_len, terminates."""
    from cosyvoice2_eu_tpu.models.llm_v1 import init_lm_v1, lm_v1_decode

    cfg = _tiny_lm_cfg()
    params = init_lm_v1(jax.random.key(0), cfg)
    rng = np.random.default_rng(10)
    tt, ts = 8, 4
    text = jnp.asarray(rng.integers(1, cfg.text_token_size, (1, tt)), jnp.int32)
    prompt_speech = jnp.asarray(rng.integers(0, cfg.speech_token_size, (1, ts)), jnp.int32)
    emb = jnp.asarray(rng.standard_normal((1, cfg.spk_embed_dim)), jnp.float32)

    tokens, lengths = lm_v1_decode(
        params, cfg, text, jnp.asarray([tt]), jnp.asarray([2]),
        prompt_speech, jnp.asarray([ts]), emb, jax.random.key(3), max_gen=40,
    )
    n = int(lengths[0])
    min_len = int((tt - 2) * cfg.min_token_text_ratio)
    assert min_len <= n <= 40
    toks = np.asarray(tokens)[0, :n]
    assert ((toks >= 0) & (toks < cfg.speech_token_size)).all()


# ---------------------------------------------------------------------------
# CosyVoice1Model orchestrator (runtime/model_v1.py)
# ---------------------------------------------------------------------------

def _tiny_v1_bundle():
    """Tiny TTSV1Config with consistent geometry: 5 Hz tokens, 32-sample
    mel hop, 2 mel frames per token, hift upsample 4*2*4 == 32."""
    from cosyvoice2_eu_tpu.config import (
        F0PredictorConfig,
        FrontendConfig,
        HiFTConfig,
        MelConfig,
        TTSV1Config,
    )

    mels = MELS
    flow = dataclasses.replace(
        _tiny_flow_cfg(mels),
        input_frame_rate=5, sample_rate=320, mel_hop=32, cache_tail_tokens=4,
        spk_embed_dim=10,  # shared with the LM (192 in production)
    )
    hift = HiFTConfig(
        in_channels=mels, base_channels=32, nb_harmonics=2, sampling_rate=320,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        source_resblock_kernel_sizes=(7, 11),
        source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        f0_predictor=F0PredictorConfig(in_channels=mels, cond_channels=32),
    )
    cfg = TTSV1Config(
        llm=_tiny_lm_cfg(), flow=flow, hift=hift,
        token_overlap_len=4, mel_cache_len=3,
        mel=MelConfig(n_fft=64, num_mels=mels, sampling_rate=320,
                      hop_size=32, win_size=64),
        frontend=FrontendConfig(target_sr=320, spk_embed_dim=10),
    )
    assert cfg.hift.upsample_scale == cfg.flow.mel_hop
    return cfg


def _tiny_v1_params(cfg):
    from cosyvoice2_eu_tpu.models.flow_v1 import init_flow_v1
    from cosyvoice2_eu_tpu.models.hift import init_hift
    from cosyvoice2_eu_tpu.models.llm_v1 import init_lm_v1

    ks = jax.random.split(jax.random.key(11), 3)
    return {
        "llm": init_lm_v1(ks[0], cfg.llm),
        "flow": init_flow_v1(ks[1], cfg.flow),
        "hift": init_hift(ks[2], cfg.hift),
    }


@pytest.mark.slow
def test_model_v1_stream_matches_nonstream_length():
    """The growing-hop streaming scheduler (cli/model.py:205) emits exactly
    the non-streaming sample count, chunk boundaries crossfaded."""
    from cosyvoice2_eu_tpu.models.flow_v1 import mel_len_for_tokens
    from cosyvoice2_eu_tpu.runtime.model_v1 import CosyVoice1Model

    cfg = _tiny_v1_bundle()
    model = CosyVoice1Model(cfg, _tiny_v1_params(cfg), seed=0)

    rng = np.random.default_rng(12)
    n_tok, n_prompt = 34, 6
    speech_tokens = rng.integers(0, cfg.flow.vocab_size - 1, n_tok).astype(np.int32)
    prompt_token = rng.integers(0, cfg.flow.vocab_size - 1, n_prompt).astype(np.int32)
    mel1 = mel_len_for_tokens(cfg.flow, n_prompt)
    prompt_feat = rng.standard_normal((mel1, cfg.flow.output_size)).astype(np.float32)
    emb = rng.standard_normal(cfg.flow.spk_embed_dim).astype(np.float32)

    full = list(model.vc(speech_tokens, prompt_token, prompt_feat, emb,
                         stream=False))
    assert len(full) == 1
    expected = mel_len_for_tokens(cfg.flow, n_tok) * cfg.hift.upsample_scale
    assert full[0].shape == (expected,)
    assert np.isfinite(full[0]).all() and np.abs(full[0]).max() > 0

    chunks = list(model.vc(speech_tokens, prompt_token, prompt_feat, emb,
                           stream=True))
    assert len(chunks) == 4  # 3 hops of 10 tokens (+4 overlap) + final 4
    total = sum(c.shape[0] for c in chunks)
    assert total == expected
    for c in chunks:
        assert np.isfinite(c).all()


@pytest.mark.slow
def test_model_v1_tts_end_to_end_and_speed():
    """Text -> LM -> flow -> hift through the public tts(); speed!=1 resamples
    the mel on the finalize chunk (cli/model.py:180)."""
    from cosyvoice2_eu_tpu.models.flow_v1 import mel_len_for_tokens
    from cosyvoice2_eu_tpu.runtime.model_v1 import CosyVoice1Model

    cfg = _tiny_v1_bundle()
    model = CosyVoice1Model(cfg, _tiny_v1_params(cfg), seed=1)

    rng = np.random.default_rng(13)
    text = rng.integers(1, cfg.llm.text_token_size, 6).astype(np.int32)
    ptext = rng.integers(1, cfg.llm.text_token_size, 2).astype(np.int32)
    psp = rng.integers(0, cfg.llm.speech_token_size, 5).astype(np.int32)
    mel1 = mel_len_for_tokens(cfg.flow, 5)
    prompt_feat = rng.standard_normal((mel1, cfg.flow.output_size)).astype(np.float32)
    emb = rng.standard_normal(cfg.llm.spk_embed_dim).astype(np.float32)

    wavs = list(model.tts(text, ptext, psp, prompt_feat, emb, max_gen=24))
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()
    n_mel = wavs[0].shape[0] // cfg.hift.upsample_scale
    assert 1 <= n_mel <= mel_len_for_tokens(cfg.flow, 24)

    # speed: finalize chunk linearly resamples the mel time axis
    # (use vc so the token sequence is fixed across the two calls)
    tokens = rng.integers(0, cfg.flow.vocab_size - 1, 12).astype(np.int32)
    psp_f = rng.integers(0, cfg.flow.vocab_size - 1, 5).astype(np.int32)
    base = list(model.vc(tokens, psp_f, prompt_feat, emb))[0]
    sped = list(model.vc(tokens, psp_f, prompt_feat, emb, speed=2.0))[0]
    t_mel = mel_len_for_tokens(cfg.flow, 12)
    assert base.shape[0] == t_mel * cfg.hift.upsample_scale
    assert sped.shape[0] == int(t_mel / 2.0) * cfg.hift.upsample_scale


# ---------------------------------------------------------------------------
# CosyVoice (v1) compat class
# ---------------------------------------------------------------------------

def _fake_frontend_fns(cfg):
    """Deterministic stand-ins for speech_tokenizer_v1.onnx / campplus.onnx."""
    fr = cfg.flow.input_frame_rate

    def tok_fn(wav_16k):
        n = max(2, int(round(len(wav_16k) / 16000 * fr)))
        return (np.arange(n) * 7 % (cfg.flow.vocab_size - 1)).astype(np.int32)

    def spk_fn(wav_16k):
        r = np.random.default_rng(len(wav_16k) % 97)
        return r.standard_normal(cfg.flow.spk_embed_dim).astype(np.float32)

    return tok_fn, spk_fn


@pytest.mark.slow
def test_cosyvoice_v1_compat_modes():
    """The reference CosyVoice surface (cli/cosyvoice.py:27): sft /
    zero_shot / cross_lingual / instruct / vc generators + spk2info."""
    from cosyvoice2_eu_tpu.compat import CosyVoice

    cfg = _tiny_v1_bundle()
    cv = CosyVoice(config=cfg, params=_tiny_v1_params(cfg))
    tok_fn, spk_fn = _fake_frontend_fns(cfg)
    cv.frontend.speech_tokenizer_fn = tok_fn
    cv.frontend.spk_embedding_fn = spk_fn

    rng = np.random.default_rng(21)
    prompt_wav = rng.standard_normal(int(2.0 * 16000)).astype(np.float32) * 0.1

    # zero-shot from raw 16 kHz prompt audio
    outs = list(cv.inference_zero_shot(
        "Hello world out there.", "A prompt.", prompt_wav, text_frontend=False))
    assert outs and all(o["tts_speech"].shape[0] == 1 for o in outs)
    assert all(np.isfinite(o["tts_speech"].numpy()).all() for o in outs)

    # speaker store round trip + sft (embedding-only conditioning)
    assert cv.add_zero_shot_spk("A prompt.", prompt_wav, "spk1")
    assert "spk1" in cv.list_available_spks()
    outs = list(cv.inference_sft("Short text.", "spk1", text_frontend=False))
    assert outs and outs[0]["tts_speech"].shape[0] == 1

    # cross-lingual: LM unprompted, flow keeps the prompt
    outs = list(cv.inference_cross_lingual(
        "Texte en francais.", prompt_wav, text_frontend=False))
    assert outs and np.isfinite(outs[0]["tts_speech"].numpy()).all()

    # instruct: gated on the -Instruct model-dir marker, drops the LM spk slot
    with pytest.raises(ValueError):
        next(cv.inference_instruct("Text.", "spk1", "A deep voice.",
                                   text_frontend=False))
    cv.instruct = True
    outs = list(cv.inference_instruct("Instructed text.", "spk1",
                                      "A deep voice.", text_frontend=False))
    assert outs and outs[0]["tts_speech"].shape[0] == 1

    # vc: source tokens straight to token2wav
    source_wav = rng.standard_normal(int(1.5 * 16000)).astype(np.float32) * 0.1
    outs = list(cv.inference_vc(source_wav, prompt_wav))
    assert outs and np.isfinite(outs[0]["tts_speech"].numpy()).all()
