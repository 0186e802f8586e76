"""HiFT vocoder: NSF harmonic source + HiFi-GAN MRF + iSTFT head.

TPU-native re-design of the reference HiFTGenerator
(reference: cosy_repo/cosyvoice/hifigan/generator.py:392, config
conf/cosyvoice2.yaml:90-112):

mel (B, 80, T) -> F0 (ConvRNNF0Predictor) -> sine-harmonic source at 24 kHz
(SineGen2 with anti-aliased cumsum-phase trick) -> STFT(16/4) source features
fused into the transposed-conv upsample stack (rates 8/5/3) with Snake
ResBlocks -> conv_post predicts log-magnitude + phase -> iSTFT -> waveform.

Weight-norm is folded at checkpoint-load time (utils/params.fold_weight_norm),
equivalent to the reference's remove_weight_norm export path
(generator.py:490).  All computation is fp32: the phase/cumsum math does not
tolerate bf16.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import HiFTConfig
from cosyvoice2_eu_tpu.ops.stft import hann_window, istft, stft
from cosyvoice2_eu_tpu.utils.params import (
    conv1d,
    conv_transpose1d,
    dense,
    init_conv1d,
    init_conv_transpose1d,
    init_dense,
    snake,
)


def _get_padding(k: int, d: int = 1) -> int:
    return (k * d - d) // 2


# ---------------------------------------------------------------------------
# F0 predictor (hifigan/f0_predictor.py:22)
# ---------------------------------------------------------------------------

def init_f0_predictor(rng, cfg: HiFTConfig) -> dict:
    fp = cfg.f0_predictor
    keys = jax.random.split(rng, fp.num_layers + 1)
    convs = []
    ch_in = fp.in_channels
    for i in range(fp.num_layers):
        convs.append(init_conv1d(keys[i], ch_in, fp.cond_channels, fp.kernel_size))
        ch_in = fp.cond_channels
    return {"convs": convs, "classifier": init_dense(keys[-1], fp.cond_channels, fp.num_class)}


def f0_predict(params, cfg: HiFTConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, 80, T) -> f0 (B, T) in Hz (non-negative)."""
    h = mel
    pad = _get_padding(cfg.f0_predictor.kernel_size)
    for cp in params["convs"]:
        h = jax.nn.elu(conv1d(cp, h, padding=pad))
    f0 = dense(params["classifier"], h.transpose(0, 2, 1))[..., 0]
    return jnp.abs(f0)


# ---------------------------------------------------------------------------
# NSF source (SineGen2 / SourceModuleHnNSF2, generator.py:226-389)
# ---------------------------------------------------------------------------

def _torch_linear_resize(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) along the last axis."""
    return jax.image.resize(x, x.shape[:-1] + (new_len,), method="linear")


def sine_source(
    params,
    cfg: HiFTConfig,
    f0_up: jnp.ndarray,
    rng: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f0_up: (B, L, 1) F0 upsampled to sample rate -> (source (B, L, 1), uv).

    Implements SineGen2's anti-aliased phase integration: per-harmonic radian
    increments are decimated by the upsample scale, cumulatively summed at
    frame rate, then linearly re-interpolated before taking the sine
    (generator.py:261-312).
    """
    b, length, _ = f0_up.shape
    scale = cfg.upsample_scale
    harmonics = cfg.nb_harmonics + 1
    k_phase, k_noise = jax.random.split(rng)

    mult = jnp.arange(1, harmonics + 1, dtype=f0_up.dtype)
    fn = f0_up * mult[None, None, :]  # (B, L, H)
    rad = (fn / cfg.sampling_rate) % 1.0

    rand_ini = jax.random.uniform(k_phase, (b, harmonics), f0_up.dtype)
    rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)

    rad_t = rad.transpose(0, 2, 1)  # (B, H, L)
    rad_lo = _torch_linear_resize(rad_t, length // scale)
    phase_lo = jnp.cumsum(rad_lo, axis=-1) * 2.0 * np.pi
    phase = _torch_linear_resize(phase_lo * scale, length)
    sines = jnp.sin(phase).transpose(0, 2, 1)  # (B, L, H)

    uv = (f0_up > cfg.nsf_voiced_threshold).astype(f0_up.dtype)  # (B, L, 1)
    sine_waves = sines * cfg.nsf_alpha
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sine_waves.shape, sine_waves.dtype)
    sine_waves = sine_waves * uv + noise

    merged = jnp.tanh(dense(params["l_linear"], sine_waves))  # (B, L, 1)
    return merged, uv


# ---------------------------------------------------------------------------
# Snake ResBlock (generator.py:29-107)
# ---------------------------------------------------------------------------

def init_resblock(rng, channels: int, kernel: int, dilations) -> dict:
    n = len(dilations)
    keys = jax.random.split(rng, 2 * n)
    return {
        "convs1": [init_conv1d(keys[i], channels, channels, kernel) for i in range(n)],
        "convs2": [init_conv1d(keys[n + i], channels, channels, kernel) for i in range(n)],
        "alpha1": [jnp.ones((channels,)) for _ in range(n)],
        "alpha2": [jnp.ones((channels,)) for _ in range(n)],
    }


def resblock(p: dict, x: jnp.ndarray, kernel: int, dilations) -> jnp.ndarray:
    k = kernel
    for i, d in enumerate(dilations):
        xt = snake(x, p["alpha1"][i])
        xt = conv1d(p["convs1"][i], xt, padding=_get_padding(k, d), dilation=d)
        xt = snake(xt, p["alpha2"][i])
        xt = conv1d(p["convs2"][i], xt, padding=_get_padding(k, 1))
        x = xt + x
    return x


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def init_hift(rng, cfg: HiFTConfig) -> dict:
    n_ups = len(cfg.upsample_rates)
    keys = iter(jax.random.split(rng, 8 + n_ups * 3 + n_ups * len(cfg.resblock_kernel_sizes)))
    base = cfg.base_channels
    stft_ch = cfg.istft_n_fft + 2

    ups, source_downs, source_resblocks, resblocks = [], [], [], []
    downsample_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    downsample_cum = np.cumprod(downsample_rates)[::-1]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups.append(init_conv_transpose1d(next(keys), base // (2**i), base // (2 ** (i + 1)), k))
    for i, (u, k, d) in enumerate(
        zip(downsample_cum, cfg.source_resblock_kernel_sizes, cfg.source_resblock_dilation_sizes)
    ):
        ch = base // (2 ** (i + 1))
        if u == 1:
            source_downs.append(init_conv1d(next(keys), stft_ch, ch, 1))
        else:
            source_downs.append(init_conv1d(next(keys), stft_ch, ch, int(u) * 2))
        source_resblocks.append(init_resblock(next(keys), ch, k, d))
    for i in range(n_ups):
        ch = base // (2 ** (i + 1))
        for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(init_resblock(next(keys), ch, k, d))

    return {
        "f0_predictor": init_f0_predictor(next(keys), cfg),
        "m_source": {"l_linear": init_dense(next(keys), cfg.nb_harmonics + 1, 1)},
        "conv_pre": init_conv1d(next(keys), cfg.in_channels, base, 7),
        "ups": ups,
        "source_downs": source_downs,
        "source_resblocks": source_resblocks,
        "resblocks": resblocks,
        "conv_post": init_conv1d(next(keys), base // (2**n_ups), stft_ch, 7),
    }


def hift_decode(params, cfg: HiFTConfig, mel: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """mel (B, 80, T), source (B, 1, T*480) -> waveform (B, T*480)."""
    win = hann_window(cfg.istft_n_fft, mel.dtype)
    s_real, s_imag = stft(source[:, 0], cfg.istft_n_fft, cfg.istft_hop_len, win, center=True)
    s_stft = jnp.concatenate([s_real, s_imag], axis=1)  # (B, n_fft+2, T')

    num_kernels = len(cfg.resblock_kernel_sizes)
    downsample_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    downsample_cum = np.cumprod(downsample_rates)[::-1]

    x = conv1d(params["conv_pre"], mel, padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = conv_transpose1d(params["ups"][i], x, stride=u, padding=(k - u) // 2)
        if i == len(cfg.upsample_rates) - 1:
            # reflection pad (1, 0) (generator.py:486,530)
            x = jnp.concatenate([x[:, :, 1:2], x], axis=2)
        du = int(downsample_cum[i])
        if du == 1:
            si = conv1d(params["source_downs"][i], s_stft)
        else:
            si = conv1d(params["source_downs"][i], s_stft, stride=du, padding=du // 2)
        si = resblock(
            params["source_resblocks"][i], si,
            cfg.source_resblock_kernel_sizes[i], cfg.source_resblock_dilation_sizes[i],
        )
        x = x + si
        xs = None
        for j in range(num_kernels):
            r = resblock(
                params["resblocks"][i * num_kernels + j], x,
                cfg.resblock_kernel_sizes[j], cfg.resblock_dilation_sizes[j],
            )
            xs = r if xs is None else xs + r
        x = xs / num_kernels

    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(params["conv_post"], x, padding=3)
    n_half = cfg.istft_n_fft // 2 + 1
    magnitude = jnp.exp(jnp.clip(x[:, :n_half], max=1e2))
    phase = jnp.sin(x[:, n_half:])  # reference: sin (redundant but kept)

    real = magnitude * jnp.cos(phase)
    imag = magnitude * jnp.sin(phase)
    audio = istft(real, imag, cfg.istft_n_fft, cfg.istft_hop_len, win, center=True)
    return jnp.clip(audio, -cfg.audio_limit, cfg.audio_limit)


def hift_inference(
    params,
    cfg: HiFTConfig,
    mel: jnp.ndarray,
    rng: jax.Array,
    cache_source: jnp.ndarray | None = None,
    cache_len: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mel (B, 80, T) -> (waveform (B, T*480), source (B, 1, T*480)).

    cache_source (B, 1, C) replaces the first ``cache_len`` source samples to
    avoid phase glitches across streaming chunks (generator.py:571-581).
    """
    f0 = f0_predict(params["f0_predictor"], cfg, mel)  # (B, T)
    f0_up = jnp.repeat(f0, cfg.upsample_scale, axis=-1)[..., None]  # (B, L, 1)
    s, _ = sine_source(params["m_source"], cfg, f0_up, rng)
    s = s.transpose(0, 2, 1)  # (B, 1, L)
    if cache_source is not None:
        c = cache_source.shape[2]
        idx = jnp.arange(s.shape[2])[None, None, :]
        pad_cache = jnp.pad(cache_source, ((0, 0), (0, 0), (0, s.shape[2] - c)))
        use_cache = idx < (cache_len if cache_len is not None else c)
        s = jnp.where(use_cache, pad_cache, s)
    audio = hift_decode(params, cfg, mel, s)
    return audio, s
