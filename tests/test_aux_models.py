"""FSQ speech tokenizer + CAM++ speaker embedding: shapes and invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.models import campplus as cam
from cosyvoice2_eu_tpu.models import speech_tokenizer as st


def test_fsq_roundtrip():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((2, 7, 8)).astype(np.float32) * 2)
    codes, quant = st.fsq_quantize(z, levels=3)
    assert codes.shape == (2, 7)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 3**8).all()
    recon = st.fsq_embed(codes, dim=8, levels=3)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(quant), atol=1e-6)


def test_fsq_straight_through_gradient():
    z = jnp.asarray(np.linspace(-2, 2, 8, dtype=np.float32))[None, None, :]
    g = jax.grad(lambda x: jnp.sum(st.fsq_quantize(x, 3)[1]))(z)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # tanh STE passes gradient


def test_speech_tokenizer_shapes():
    cfg = st.tiny_tokenizer_config()
    params = st.init_speech_tokenizer(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    T = 64  # 100 fps frames
    mel = jnp.asarray(rng.standard_normal((2, cfg.n_mels, T)).astype(np.float32))
    mel_len = jnp.asarray([64, 40])
    codes, code_len = st.encode(params, cfg, mel, mel_len)
    assert codes.shape == (2, T // 4)
    assert code_len.tolist() == [16, 10]
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < cfg.vocab_size).all()
    # pad positions zeroed
    assert (c[1, 10:] == 0).all()


def test_campplus_embedding():
    cfg = cam.tiny_campplus_config()
    params = cam.init_campplus(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    fbank = jnp.asarray(rng.standard_normal((2, 120, cfg.feat_dim)).astype(np.float32))
    emb = cam.campplus_forward(params, cfg, fbank)
    assert emb.shape == (2, cfg.embedding_size)
    assert np.isfinite(np.asarray(emb)).all()


def test_kaldi_fbank_cmn():
    rng = np.random.default_rng(3)
    wav = jnp.asarray((rng.standard_normal(16000) * 0.1).astype(np.float32))[None]
    fb = cam.kaldi_fbank_cmn(wav, num_mel_bins=80)
    assert fb.shape == (1, 98, 80)  # (16000 - 400)/160 + 1
    # CMN: zero mean over time
    np.testing.assert_allclose(np.asarray(fb).mean(axis=1), 0.0, atol=1e-4)
