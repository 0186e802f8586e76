"""Numerical parity tests for DSP ops against torch (CPU) references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cosyvoice2_eu_tpu.ops import masks as mask_ops
from cosyvoice2_eu_tpu.ops.mel import mel_filterbank, mel_spectrogram
from cosyvoice2_eu_tpu.ops.sampling import ras_sample
from cosyvoice2_eu_tpu.ops.stft import hann_window, istft, stft


@pytest.mark.parametrize("n_fft,hop,T", [(16, 4, 480), (1920, 480, 24000)])
def test_stft_matches_torch(n_fft, hop, T):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, T)).astype(np.float32)
    win = hann_window(n_fft)
    real, imag = stft(jnp.asarray(x), n_fft, hop, win, center=True)

    spec = torch.stft(
        torch.from_numpy(x), n_fft, hop, n_fft,
        window=torch.from_numpy(np.asarray(win)), return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(real), spec.real.numpy(), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(imag), spec.imag.numpy(), atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop,frames", [(16, 4, 121)])
def test_istft_matches_torch(n_fft, hop, frames):
    rng = np.random.default_rng(1)
    real = rng.standard_normal((1, n_fft // 2 + 1, frames)).astype(np.float32)
    imag = rng.standard_normal((1, n_fft // 2 + 1, frames)).astype(np.float32)
    win = hann_window(n_fft)

    y = istft(jnp.asarray(real), jnp.asarray(imag), n_fft, hop, win, center=True)
    y_t = torch.istft(
        torch.complex(torch.from_numpy(real), torch.from_numpy(imag)),
        n_fft, hop, n_fft, window=torch.from_numpy(np.asarray(win)),
    )
    assert y.shape == tuple(y_t.shape)
    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), atol=1e-4, rtol=1e-4)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4800)).astype(np.float32)
    win = hann_window(16)
    real, imag = stft(jnp.asarray(x), 16, 4, win, center=True)
    y = istft(real, imag, 16, 4, win, center=True)
    np.testing.assert_allclose(np.asarray(y)[:, 16:-16], x[:, 16 : y.shape[1] - 16], atol=1e-4)


def test_mel_spectrogram_matches_torch_reference():
    """Re-implements matcha.utils.audio.mel_spectrogram in torch and compares."""
    rng = np.random.default_rng(3)
    x = (0.5 * rng.standard_normal((1, 24000))).astype(np.float32).clip(-1, 1)
    got = mel_spectrogram(jnp.asarray(x))
    assert got.shape == (1, 80, 50)

    y = torch.from_numpy(x)
    n_fft, hop, win_size = 1920, 480, 1920
    y = torch.nn.functional.pad(
        y.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)), mode="reflect"
    ).squeeze(1)
    spec = torch.view_as_real(
        torch.stft(y, n_fft, hop_length=hop, win_length=win_size,
                   window=torch.hann_window(win_size), center=False,
                   pad_mode="reflect", normalized=False, onesided=True,
                   return_complex=True)
    )
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    basis = torch.from_numpy(mel_filterbank(24000, 1920, 80, 0.0, None))
    ref = torch.log(torch.clamp(torch.matmul(basis, spec), min=1e-5))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-3, rtol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1920, 80, 0.0, None)
    assert fb.shape == (80, 961)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_chunk_attention_mask():
    m = mask_ops.chunk_attention_mask(jnp.asarray([7]), 8, chunk_size=2)
    m = np.asarray(m)[0]
    # query 0 sees its own chunk [0,1] but not 2
    assert m[0, 1] and not m[0, 2]
    # query 5 sees all previous plus own chunk
    assert m[5].tolist()[:6] == [True] * 6 and not m[5, 6]
    # padding column masked everywhere
    assert not m[:, 7].any()

    full = np.asarray(mask_ops.chunk_attention_mask(jnp.asarray([8]), 8, chunk_size=0))[0]
    assert full.all()


def test_ras_sample_respects_eos_ban_and_topk():
    vocab = 100
    logits = jnp.full((vocab,), -10.0).at[90].set(5.0).at[91].set(4.0)
    recent = jnp.full((10,), -1, jnp.int32)
    # eos=90 banned -> must pick 91
    tok = ras_sample(jax.random.key(0), logits, recent, jnp.asarray(True), eos=90)
    assert int(tok) == 91 or int(tok) < 90
    # without ban, top token dominates
    draws = [
        int(ras_sample(jax.random.key(i), logits, recent, jnp.asarray(False), eos=99))
        for i in range(20)
    ]
    assert draws.count(90) > 10


def test_ras_sample_repetition_triggers_full_resample():
    vocab = 50
    logits = jnp.full((vocab,), 0.0).at[7].set(5.0)  # p(7) ~ 0.75 full softmax
    recent = jnp.full((10,), 7, jnp.int32)  # 7 repeated in the whole window
    n = 50
    hot = [
        int(ras_sample(jax.random.key(i), logits, recent, jnp.asarray(False), eos=49))
        for i in range(n)
    ]
    cold = [
        int(ras_sample(jax.random.key(i), logits, jnp.full((10,), -1, jnp.int32),
                       jnp.asarray(False), eos=49))
        for i in range(n)
    ]
    # with a repeated window, draws fall back to the flatter full softmax:
    # expect ~12 escapes vs ~3 without repetition (p(7|nucleus) ~ 0.94)
    assert sum(d != 7 for d in hot) >= 3
    assert sum(d != 7 for d in hot) > sum(d != 7 for d in cold)


def test_mel_spectrogram_np_matches_device_op():
    """The host-numpy pipeline featurizer must match the jitted device mel
    (same math; the data pipeline trains against these features)."""
    from cosyvoice2_eu_tpu.ops.mel import mel_spectrogram_np

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(24000 * 3) * 0.2).astype(np.float32)
    want = np.asarray(mel_spectrogram(jnp.asarray(wav[None])))[0]
    got = mel_spectrogram_np(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # batched form too
    got2 = mel_spectrogram_np(np.stack([wav, wav * 0.5]))
    np.testing.assert_allclose(got2[0], want, atol=2e-5, rtol=1e-5)
