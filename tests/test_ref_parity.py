"""Activation parity against the ACTUAL reference PyTorch modules.

Random-initialized reference modules (cosy_repo/cosyvoice) are converted by
the production checkpoint converters and compared activation-for-activation
with the JAX ports — the same code path a real llm.pt/flow.pt/hift.pt goes
through (tools/convert_and_verify.py runs these at full size on real files).

Skipped when /root/reference is not present.
"""

import os

import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import (
    CFMConfig,
    ConformerConfig,
    EstimatorConfig,
    F0PredictorConfig,
    FlowConfig,
    HiFTConfig,
    tiny_test_config,
)
from cosyvoice2_eu_tpu.runtime import refverify as rv

pytestmark = pytest.mark.skipif(
    not rv.reference_available(), reason="reference checkout not present"
)


def test_hift_decode_parity():
    cfg = tiny_test_config().hift
    import torch

    torch.manual_seed(1)
    ref = rv.build_ref_hift(cfg)
    rng = np.random.default_rng(0)
    t_mel = 20
    mel = rng.standard_normal((1, cfg.in_channels, t_mel)).astype(np.float32)
    source = (rng.standard_normal((1, 1, t_mel * cfg.upsample_scale)) * 0.1).astype(np.float32)
    report = rv.hift_parity(ref, cfg, mel, source)
    assert report["ok"], report


def _small_flow_config() -> FlowConfig:
    # encoder must be the production 512 width (the reference hardcodes its
    # lookahead/upsample channels); estimator shrinks freely
    return FlowConfig(
        input_size=512,
        output_size=80,
        vocab_size=128,
        # the reference hardcodes 4 up_encoders and 512-wide lookahead/upsample
        encoder=ConformerConfig(num_blocks=1, num_up_blocks=4, linear_units=256),
        estimator=EstimatorConfig(
            channels=(64,), attention_head_dim=16, n_blocks=1,
            num_mid_blocks=2, num_heads=4,
        ),
        cfm=CFMConfig(rand_noise_frames=512),
    )


@pytest.mark.parametrize("streaming", [False, True])
def test_flow_inference_parity(streaming):
    import torch

    cfg = _small_flow_config()
    torch.manual_seed(2)
    ref = rv.build_ref_flow(cfg)
    rng = np.random.default_rng(3)
    n_tok, n_prompt_mel = 16, 8
    token = rng.integers(0, cfg.vocab_size, (1, n_tok)).astype(np.int64)
    prompt_feat = (rng.standard_normal((1, n_prompt_mel, cfg.output_size)) * 0.5).astype(np.float32)
    embedding = rng.standard_normal((1, cfg.spk_embed_dim)).astype(np.float32)
    report = rv.flow_parity(ref, cfg, token, prompt_feat, embedding, streaming=streaming)
    assert report["ok"], report


def test_f0_predictor_parity():
    cfg = tiny_test_config().hift
    import torch

    torch.manual_seed(8)
    ref = rv.build_ref_hift(cfg)
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((1, cfg.in_channels, 24)).astype(np.float32)
    report = rv.f0_parity(ref, cfg, mel)
    assert report["ok"], report


def test_token2wav_composed_parity():
    """Full-chain seam coverage (VERDICT r3 next #7): one set of speech
    tokens through torch flow+HiFT vs JAX flow+HiFT, waveform tolerance
    (reference token2wav, cli/model.py:300-334)."""
    import torch

    flow_cfg = _small_flow_config()
    hift_cfg = HiFTConfig(
        in_channels=flow_cfg.output_size,
        base_channels=32,
        nb_harmonics=2,
        upsample_rates=(8, 5, 3),
        upsample_kernel_sizes=(16, 11, 7),
        f0_predictor=F0PredictorConfig(
            in_channels=flow_cfg.output_size, cond_channels=32
        ),
    )
    torch.manual_seed(10)
    ref_flow = rv.build_ref_flow(flow_cfg)
    ref_hift = rv.build_ref_hift(hift_cfg)
    rng = np.random.default_rng(11)
    n_tok, n_prompt_mel = 16, 8
    token = rng.integers(0, flow_cfg.vocab_size, (1, n_tok)).astype(np.int64)
    prompt_feat = (
        rng.standard_normal((1, n_prompt_mel, flow_cfg.output_size)) * 0.5
    ).astype(np.float32)
    embedding = rng.standard_normal((1, flow_cfg.spk_embed_dim)).astype(np.float32)
    report = rv.token2wav_parity(
        ref_flow, ref_hift, flow_cfg, hift_cfg, token, prompt_feat, embedding
    )
    assert report["ok"], report


def test_llm_logits_parity(tmp_path):
    import torch

    cfg = tiny_test_config().llm
    rv.make_tiny_qwen_dir(cfg, str(tmp_path / "qwen"))
    torch.manual_seed(4)
    ref = rv.build_ref_qwen2lm(cfg, str(tmp_path / "qwen"))
    rng = np.random.default_rng(5)
    text = rng.integers(2, cfg.backbone.vocab_size, 7).astype(np.int32)
    speech = rng.integers(0, cfg.speech_token_size, 11).astype(np.int32)
    report = rv.llm_logits_parity(ref, cfg, text, speech)
    assert report["ok"], report


def test_lm_training_loss_parity(tmp_path):
    """Full training objective vs the reference: Qwen2LM.forward's
    prepare_lm_input_target + label-smoothing CE + accuracy must equal
    lm_loss_fn over build_lm_batch (unistream rows: speech/text ratio < 3
    makes the reference's choice deterministic, llm.py:445)."""
    import torch

    from cosyvoice2_eu_tpu.config import TrainConfig
    from cosyvoice2_eu_tpu.parallel.train_step import lm_loss_fn
    from cosyvoice2_eu_tpu.runtime.checkpoint import convert_llm
    from cosyvoice2_eu_tpu.train.sequences import build_lm_batch

    cfg = tiny_test_config().llm
    rv.make_tiny_qwen_dir(cfg, str(tmp_path / "qwen"))
    torch.manual_seed(6)
    ref = rv.build_ref_qwen2lm(cfg, str(tmp_path / "qwen"))
    params = convert_llm(rv.state_dict_numpy(ref), cfg)

    rng = np.random.default_rng(7)
    texts = [rng.integers(2, cfg.backbone.vocab_size, 6 + i).astype(np.int32) for i in range(3)]
    speeches = [rng.integers(0, cfg.speech_token_size, 12 + 2 * i).astype(np.int32) for i in range(3)]

    t_max = max(len(t) for t in texts)
    s_max = max(len(s) for s in speeches)
    ref_batch = {
        "text_token": torch.stack([
            torch.from_numpy(np.pad(t, (0, t_max - len(t)))).long() for t in texts
        ]),
        "text_token_len": torch.tensor([len(t) for t in texts], dtype=torch.int32),
        "speech_token": torch.stack([
            torch.from_numpy(np.pad(s, (0, s_max - len(s)))).long() for s in speeches
        ]),
        "speech_token_len": torch.tensor([len(s) for s in speeches], dtype=torch.int32),
    }
    with torch.inference_mode():
        out = ref.forward(ref_batch, torch.device("cpu"))
    want_loss, want_acc = float(out["loss"]), float(out["acc"])

    import jax.numpy as jnp

    batch = build_lm_batch(texts, speeches, cfg, np.random.default_rng(0),
                           bistream_prob=0.0, pad_to=64)
    loss, metrics = lm_loss_fn(
        {k: v for k, v in params.items()}, cfg,
        {k: jnp.asarray(v) for k, v in batch.items()}, TrainConfig(),
    )
    assert abs(float(loss) - want_loss) < 1e-3, (float(loss), want_loss)
    assert abs(float(metrics["acc"]) - want_acc) < 1e-6
