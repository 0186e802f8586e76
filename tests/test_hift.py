"""HiFT vocoder: shape, source model, and cache-splice behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import tiny_test_config
from cosyvoice2_eu_tpu.models.hift import (
    f0_predict,
    hift_inference,
    init_hift,
    sine_source,
)

CFG = tiny_test_config().hift


@pytest.fixture(scope="module")
def params():
    return init_hift(jax.random.key(0), CFG)


def test_inference_shape(params):
    rng = np.random.default_rng(0)
    T = 12
    mel = rng.standard_normal((1, CFG.in_channels, T)).astype(np.float32)
    audio, source = hift_inference(params, CFG, jnp.asarray(mel), jax.random.key(1))
    assert audio.shape == (1, T * CFG.upsample_scale)
    assert source.shape == (1, 1, T * CFG.upsample_scale)
    a = np.asarray(audio)
    assert np.isfinite(a).all()
    assert np.abs(a).max() <= CFG.audio_limit + 1e-6


def test_f0_predictor_nonnegative(params):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, CFG.in_channels, 9)).astype(np.float32)
    f0 = f0_predict(params["f0_predictor"], CFG, jnp.asarray(mel))
    assert f0.shape == (2, 9)
    assert (np.asarray(f0) >= 0).all()


def test_sine_source_voiced_periodicity(params):
    """A constant voiced F0 must produce a dominant spectral peak at F0."""
    sr, scale = CFG.sampling_rate, CFG.upsample_scale
    L = 96 * scale
    f0 = np.full((1, L, 1), 200.0, np.float32)
    src, uv = sine_source(params["m_source"], CFG, jnp.asarray(f0), jax.random.key(2))
    assert (np.asarray(uv) == 1).all()
    s = np.asarray(src)[0, :, 0]
    spec = np.abs(np.fft.rfft(s * np.hanning(len(s))))
    freqs = np.fft.rfftfreq(len(s), 1.0 / sr)
    # ignore the DC offset injected by the (random-init) merge bias; the peak
    # must land on an F0 harmonic
    spec[freqs < 50.0] = 0.0
    peak = freqs[np.argmax(spec)]
    assert min(abs(peak - 200.0 * k) for k in range(1, CFG.nb_harmonics + 2)) < 10.0


def test_sine_source_unvoiced_is_noise(params):
    L = 8 * CFG.upsample_scale
    f0 = np.zeros((1, L, 1), np.float32)  # below voiced threshold
    src, uv = sine_source(params["m_source"], CFG, jnp.asarray(f0), jax.random.key(3))
    assert (np.asarray(uv) == 0).all()
    s = np.asarray(src)[0, :, 0]
    # noise-dominated: low autocorrelation at lag = period of any tone
    ac = np.corrcoef(s[:-100], s[100:])[0, 1]
    assert abs(ac) < 0.2


def test_cache_source_splice(params):
    rng = np.random.default_rng(4)
    T = 10
    mel = rng.standard_normal((1, CFG.in_channels, T)).astype(np.float32)
    cache_len = 2 * CFG.upsample_scale
    cache = rng.standard_normal((1, 1, cache_len)).astype(np.float32) * 0.05
    audio, source = hift_inference(
        params, CFG, jnp.asarray(mel), jax.random.key(5),
        cache_source=jnp.asarray(cache), cache_len=jnp.asarray(cache_len),
    )
    np.testing.assert_allclose(np.asarray(source)[:, :, :cache_len], cache, atol=1e-6)
