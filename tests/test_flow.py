"""Flow-matching mel decoder: shape, masking, and streaming invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import tiny_test_config
from cosyvoice2_eu_tpu.models.encoder import rel_shift, upsample_conformer_forward
from cosyvoice2_eu_tpu.models.estimator import estimator_forward
from cosyvoice2_eu_tpu.models.flow import flow_inference, init_flow, make_rand_noise

CFG = tiny_test_config().flow


@pytest.fixture(scope="module")
def params():
    return init_flow(jax.random.key(0), CFG)


def test_rel_shift_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 5, 9)).astype(np.float32)  # (B,H,T,2T-1)
    got = np.asarray(rel_shift(jnp.asarray(x)))

    xt = torch.from_numpy(x)
    zero_pad = torch.zeros((1, 2, 5, 1))
    x_padded = torch.cat([zero_pad, xt], dim=-1).view(1, 2, 10, 5)
    want = x_padded[:, :, 1:].view_as(xt)[:, :, :, : 9 // 2 + 1].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_encoder_shapes_and_padding_invariance(params):
    rng = np.random.default_rng(1)
    T, D = 12, CFG.input_size
    x = rng.standard_normal((1, T, D)).astype(np.float32) * 0.1
    # exact-length run
    y1, l1 = upsample_conformer_forward(params["encoder"], CFG.encoder, jnp.asarray(x), jnp.asarray([T]))
    assert y1.shape == (1, T * 2, CFG.encoder.output_size)
    assert int(l1[0]) == T * 2
    # padded run: same content in a longer bucket
    xp = np.zeros((1, T + 6, D), np.float32)
    xp[:, :T] = x
    y2, _ = upsample_conformer_forward(params["encoder"], CFG.encoder, jnp.asarray(xp), jnp.asarray([T]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2)[:, : T * 2], atol=1e-4, rtol=1e-3)


def test_estimator_streaming_chunk_causality(params):
    """With streaming chunk masks, frames in chunk c must not see future chunks."""
    rng = np.random.default_rng(2)
    B, C, T = 1, CFG.output_size, 16
    chunk = CFG.estimator.static_chunk_size  # 50 in prod; tiny cfg keeps 50 > T
    # use a small chunk by overriding config
    import dataclasses

    est_cfg = dataclasses.replace(CFG.estimator, static_chunk_size=4)
    x = rng.standard_normal((B, C, T)).astype(np.float32) * 0.1
    mu = rng.standard_normal((B, C, T)).astype(np.float32) * 0.1
    spks = rng.standard_normal((B, C)).astype(np.float32) * 0.1
    cond = np.zeros((B, C, T), np.float32)
    mask = np.ones((B, 1, T), np.float32)
    t = np.asarray([0.4], np.float32)

    out1 = estimator_forward(
        params["estimator"], est_cfg, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(mu),
        jnp.asarray(t), jnp.asarray(spks), jnp.asarray(cond), streaming=True,
    )
    mu2 = mu.copy()
    mu2[:, :, 8:] += 10.0  # perturb chunks >= 2
    x2 = x.copy()
    x2[:, :, 8:] -= 5.0
    out2 = estimator_forward(
        params["estimator"], est_cfg, jnp.asarray(x2), jnp.asarray(mask), jnp.asarray(mu2),
        jnp.asarray(t), jnp.asarray(spks), jnp.asarray(cond), streaming=True,
    )
    np.testing.assert_allclose(
        np.asarray(out1)[:, :, :8], np.asarray(out2)[:, :, :8], atol=1e-4, rtol=1e-3
    )
    # sanity: later frames DID change
    assert np.abs(np.asarray(out1)[:, :, 8:] - np.asarray(out2)[:, :, 8:]).max() > 1e-3


def test_flow_inference_end_to_end(params):
    rng = np.random.default_rng(3)
    T_tok, P_mel = 16, 8  # 4 prompt tokens -> 8 prompt mel frames
    tokens = rng.integers(0, CFG.vocab_size, (1, T_tok)).astype(np.int32)
    prompt_feat = rng.standard_normal((1, P_mel, CFG.output_size)).astype(np.float32)
    xvec = rng.standard_normal((1, CFG.spk_embed_dim)).astype(np.float32)

    mel = flow_inference(
        params, CFG,
        jnp.asarray(tokens), jnp.asarray([T_tok]),
        jnp.asarray(prompt_feat), jnp.asarray([P_mel]),
        jnp.asarray(xvec),
    )
    assert mel.shape == (1, CFG.output_size, T_tok * CFG.token_mel_ratio)
    assert np.isfinite(np.asarray(mel)).all()


def test_rand_noise_matches_torch_seed0():
    import torch

    torch.manual_seed(0)
    want = torch.randn([1, 16, 64]).numpy()
    got = make_rand_noise(64, 16)
    np.testing.assert_allclose(got, want, atol=0)
