"""HiFT GAN training: discriminators + adversarial/feature/mel/TPR losses.

Re-expression of the reference GAN stack (reference:
cosy_repo/cosyvoice/hifigan/hifigan.py:9 HiFiGan wrapper,
cosy_repo/cosyvoice/hifigan/discriminator.py:15,149,196
MultipleDiscriminator = Matcha MPD + MultiResSpecDiscriminator,
third_party/Matcha-TTS/matcha/hifigan/models.py:209-273 DiscriminatorP/MPD,
cosy_repo/cosyvoice/utils/losses.py:6 tpr_loss / :23 mel_loss).

LSGAN objectives; generator loss = adv + 2*feature_match + 45*multi-mel L1 +
1*TPR + F0 L1.  Discriminator convs are plain (the reference's weight_norm is
a training parametrization, not a different function class); alternating
generator/discriminator turns mirror executor.py:121-134.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import HiFTConfig, MelConfig
from cosyvoice2_eu_tpu.models.hift import hift_decode, f0_predict, sine_source
from cosyvoice2_eu_tpu.ops.mel import mel_spectrogram
from cosyvoice2_eu_tpu.ops.stft import hann_window, stft
from cosyvoice2_eu_tpu.utils.params import conv1d, init_conv1d

LRELU_SLOPE = 0.1
MPD_PERIODS = (2, 3, 5, 7, 11)
MRD_FFT = (1024, 2048, 512)
MRD_HOP = (120, 240, 50)
MRD_WIN = (600, 1200, 240)


def _init_conv2d(rng, cin, cout, k, stride=(1, 1)):
    k1, k2 = jax.random.split(rng)
    fan_in = cin * k[0] * k[1]
    bound = math.sqrt(1.0 / fan_in)
    return {
        "weight": jax.random.uniform(k1, (cout, cin, k[0], k[1]), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=stride, padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


# ---------------------------------------------------------------------------
# Multi-period discriminator (periods 2/3/5/7/11)
# ---------------------------------------------------------------------------

def init_mpd(rng) -> list:
    discs = []
    for i, period in enumerate(MPD_PERIODS):
        keys = jax.random.split(jax.random.fold_in(rng, i), 6)
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
        convs = []
        for j, (cin, cout) in enumerate(chans):
            convs.append(_init_conv2d(keys[j], cin, cout, (5, 1)))
        discs.append({"convs": convs, "post": _init_conv2d(keys[5], 1024, 1, (3, 1))})
    return discs


def _disc_p(p, x, period):
    b, c, t = x.shape
    n_pad = (-t) % period
    if n_pad:
        x = jnp.concatenate([x, x[:, :, t - n_pad :][:, :, ::-1]], axis=2)  # reflect pad
        t += n_pad
    x = x.reshape(b, c, t // period, period)
    fmap = []
    for j, cp in enumerate(p["convs"]):
        stride = (3, 1) if j < 4 else (1, 1)
        x = _conv2d(cp, x, stride=stride, padding=((2, 2), (0, 0)))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d(p["post"], x, padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


# ---------------------------------------------------------------------------
# Multi-resolution spectrogram discriminator
# ---------------------------------------------------------------------------

def init_mrd(rng) -> list:
    discs = []
    for i in range(len(MRD_FFT)):
        keys = jax.random.split(jax.random.fold_in(rng, 100 + i), 6)
        convs = [
            _init_conv2d(keys[0], 1, 32, (3, 9)),
            _init_conv2d(keys[1], 32, 32, (3, 9)),
            _init_conv2d(keys[2], 32, 32, (3, 9)),
            _init_conv2d(keys[3], 32, 32, (3, 9)),
            _init_conv2d(keys[4], 32, 32, (3, 3)),
        ]
        discs.append({"convs": convs, "post": _init_conv2d(keys[5], 32, 1, (3, 3))})
    return discs


def _disc_r(p, y, fft, hop, win):
    # magnitude spectrogram (B, frames, F) as a 1-channel image
    w = jnp.zeros(fft).at[: win].set(jnp.asarray(hann_window(win)))
    # torch.stft(win_length=win): window centered in the fft frame
    pad_w = (fft - win) // 2
    w = jnp.roll(w, pad_w)
    real, imag = stft(y, fft, hop, w, center=True)
    mag = jnp.sqrt(real * real + imag * imag + 1e-9)
    x = mag.transpose(0, 2, 1)[:, None]  # (B, 1, frames, F)
    fmap = []
    for j, cp in enumerate(p["convs"]):
        kw = cp["weight"].shape[-1]
        stride = (1, 2) if 1 <= j <= 3 else (1, 1)
        x = _conv2d(cp, x, stride=stride, padding=((1, 1), (kw // 2, kw // 2)))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d(p["post"], x, padding=((1, 1), (1, 1)))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_discriminator(rng) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"mpd": init_mpd(k1), "mrd": init_mrd(k2)}


def discriminator_forward(params: dict, y: jnp.ndarray, y_hat: jnp.ndarray):
    """y/y_hat (B, T) -> (scores_real, scores_gen, fmaps_real, fmaps_gen)."""
    yr, yg, fr, fg = [], [], [], []
    for p, period in zip(params["mpd"], MPD_PERIODS):
        s, f = _disc_p(p, y[:, None], period)
        yr.append(s), fr.append(f)
        s, f = _disc_p(p, y_hat[:, None], period)
        yg.append(s), fg.append(f)
    for p, fft, hop, win in zip(params["mrd"], MRD_FFT, MRD_HOP, MRD_WIN):
        s, f = _disc_r(p, y, fft, hop, win)
        yr.append(s), fr.append(f)
        s, f = _disc_r(p, y_hat, fft, hop, win)
        yg.append(s), fg.append(f)
    return yr, yg, fr, fg


# ---------------------------------------------------------------------------
# losses (LSGAN + feature matching + TPR + multi-mel)
# ---------------------------------------------------------------------------

def generator_adv_loss(scores_gen: List[jnp.ndarray]) -> jnp.ndarray:
    return sum(jnp.mean((1.0 - s) ** 2) for s in scores_gen)


def discriminator_adv_loss(scores_real, scores_gen) -> jnp.ndarray:
    return sum(
        jnp.mean((1.0 - r) ** 2) + jnp.mean(g**2) for r, g in zip(scores_real, scores_gen)
    )


def feature_loss(fmaps_real, fmaps_gen) -> jnp.ndarray:
    loss = 0.0
    for fr, fg in zip(fmaps_real, fmaps_gen):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0  # matcha feature_loss scales by 2


def tpr_loss(scores_gen, scores_real, tau: float = 0.04) -> jnp.ndarray:
    """Truncated pointwise relativistic loss (utils/losses.py:6)."""
    loss = 0.0
    for dr, dg in zip(scores_real, scores_gen):
        diff = dr - dg
        m = jnp.median(diff)
        centered = diff - m
        mask = diff < m
        sq = jnp.where(mask, centered**2, 0.0)
        l_rel = jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1)
        loss += tau - jax.nn.relu(tau - l_rel)
    return loss


def multi_mel_loss(real: jnp.ndarray, gen: jnp.ndarray, mel_cfg: MelConfig) -> jnp.ndarray:
    """Multi-mel spectral L1 (utils/losses.py:23; single transform in yaml)."""
    mr = mel_spectrogram(
        real, mel_cfg.n_fft, mel_cfg.num_mels, mel_cfg.sampling_rate,
        mel_cfg.hop_size, mel_cfg.win_size, mel_cfg.fmin, mel_cfg.fmax, mel_cfg.center,
    )
    mg = mel_spectrogram(
        gen, mel_cfg.n_fft, mel_cfg.num_mels, mel_cfg.sampling_rate,
        mel_cfg.hop_size, mel_cfg.win_size, mel_cfg.fmin, mel_cfg.fmax, mel_cfg.center,
    )
    return jnp.mean(jnp.abs(mr - mg))


def generator_step_loss(
    gen_params: dict,
    disc_params: dict,
    hift_cfg: HiFTConfig,
    mel_cfg: MelConfig,
    batch: dict,
    rng: jax.Array,
    feat_match_weight: float = 2.0,
    mel_weight: float = 45.0,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
):
    """Generator turn (hifigan.py:32 forward_generator)."""
    mel = batch["speech_feat"].transpose(0, 2, 1)  # (B, 80, T)
    real = batch["speech"]
    f0 = f0_predict(gen_params["f0_predictor"], hift_cfg, mel)
    f0_up = jnp.repeat(f0, hift_cfg.upsample_scale, axis=-1)[..., None]
    s, _ = sine_source(gen_params["m_source"], hift_cfg, f0_up, rng)
    gen = hift_decode(gen_params, hift_cfg, mel, s.transpose(0, 2, 1))
    gen = gen[:, : real.shape[1]]

    yr, yg, fr, fg = discriminator_forward(disc_params, real, gen)
    loss_gen = generator_adv_loss(yg)
    loss_fm = feature_loss(fr, fg)
    loss_mel = multi_mel_loss(real, gen, mel_cfg)
    loss_tpr = tpr_loss(yg, yr, tpr_tau) if tpr_weight else 0.0
    loss_f0 = jnp.mean(jnp.abs(f0 - batch["pitch_feat"]))
    total = (
        loss_gen + feat_match_weight * loss_fm + mel_weight * loss_mel
        + tpr_weight * loss_tpr + loss_f0
    )
    return total, {
        "loss": total, "loss_gen": loss_gen, "loss_fm": loss_fm,
        "loss_mel": loss_mel, "loss_tpr": loss_tpr, "loss_f0": loss_f0,
    }


def discriminator_step_loss(
    disc_params: dict,
    gen_params: dict,
    hift_cfg: HiFTConfig,
    batch: dict,
    rng: jax.Array,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
):
    """Discriminator turn (hifigan.py forward_discriminator)."""
    mel = batch["speech_feat"].transpose(0, 2, 1)
    real = batch["speech"]
    f0 = f0_predict(gen_params["f0_predictor"], hift_cfg, mel)
    f0_up = jnp.repeat(f0, hift_cfg.upsample_scale, axis=-1)[..., None]
    s, _ = sine_source(gen_params["m_source"], hift_cfg, f0_up, rng)
    gen = hift_decode(gen_params, hift_cfg, mel, s.transpose(0, 2, 1))
    gen = jax.lax.stop_gradient(gen[:, : real.shape[1]])

    yr, yg, _, _ = discriminator_forward(disc_params, real, gen)
    loss_disc = discriminator_adv_loss(yr, yg)
    loss_tpr = tpr_loss(yg, yr, tpr_tau) if tpr_weight else 0.0
    total = loss_disc + tpr_weight * loss_tpr
    return total, {"loss": total, "loss_disc": loss_disc, "loss_tpr": loss_tpr}
