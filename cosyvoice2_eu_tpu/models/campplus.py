"""CAM++ speaker-embedding network (x-vector extractor).

TPU-native replacement for the reference's ``campplus.onnx`` (ONNX Runtime
binary, consumed at cosy_repo/cosyvoice/cli/frontend.py:276-283 and
tools/extract_embedding.py:24-35; no Python source in-tree).  Architecture
follows the published CAM++ design (D-TDNN backbone with context-aware
masking, 2-D conv front-end, stats pooling, 192-d embedding), matching the
3D-Speaker reference topology: FCM front-end -> TDNN stem ->
3 dense-TDNN blocks (12/24/16 layers, growth 32, dilations 1/2/2) with CAM ->
transit layers -> stats pooling -> 192-d dense.

Input: 80-bin kaldi fbank with per-utterance mean subtraction (CMN), 16 kHz.
Weight conversion from the ONNX graph lands with runtime/onnx_import.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.utils.params import (
    conv1d,
    dense,
    init_conv1d,
    init_dense,
)


@dataclasses.dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    fcm_channels: int = 32
    stem_channels: int = 128
    growth_rate: int = 32
    bn_channels: int = 128  # bottleneck inside dense layers
    block_layers: tuple = (12, 24, 16)
    block_dilations: tuple = (1, 2, 2)
    kernel_size: int = 3


def tiny_campplus_config() -> CAMPPlusConfig:
    return CAMPPlusConfig(
        feat_dim=16, embedding_size=32, fcm_channels=4, stem_channels=16,
        growth_rate=8, bn_channels=16, block_layers=(2, 2), block_dilations=(1, 2),
    )


def _init_bn(c):
    return {
        "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _bn(p, x, eps=1e-5):
    """BatchNorm1d in inference mode over (B, C, T)."""
    w = (p["weight"] / jnp.sqrt(p["var"] + eps)).astype(x.dtype)
    b = (p["bias"] - p["mean"] * w).astype(x.dtype)
    return x * w[None, :, None] + b[None, :, None]


def _bn2d(p, x, eps=1e-5):
    """BatchNorm2d in inference mode over (B, C, H, W)."""
    w = (p["weight"] / jnp.sqrt(p["var"] + eps)).astype(x.dtype)
    b = (p["bias"] - p["mean"] * w).astype(x.dtype)
    return x * w[None, :, None, None] + b[None, :, None, None]


def _init_conv2d(rng, cin, cout, k):
    import math

    fan_in = cin * k * k
    bound = math.sqrt(1.0 / fan_in)
    k1, k2 = jax.random.split(rng)
    return {
        "weight": jax.random.uniform(k1, (cout, cin, k, k), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _conv2d(p, x, stride=(1, 1), padding=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


def init_campplus(rng, cfg: CAMPPlusConfig) -> dict:
    keys = iter(jax.random.split(rng, 1000))
    fc = cfg.fcm_channels
    params = {
        "fcm": {
            "conv1": _init_conv2d(next(keys), 1, fc, 3),
            "bn1": _init_bn(fc),
            "conv2": _init_conv2d(next(keys), fc, fc, 3),
            "bn2": _init_bn(fc),
        }
    }
    stem_in = fc * (cfg.feat_dim // 4)
    params["stem"] = {
        "conv": init_conv1d(next(keys), stem_in, cfg.stem_channels, 5),
        "bn": _init_bn(cfg.stem_channels),
    }
    channels = cfg.stem_channels
    blocks = []
    for n_layers, dil in zip(cfg.block_layers, cfg.block_dilations):
        layers = []
        for _ in range(n_layers):
            layers.append(
                {
                    "bn1": _init_bn(channels),
                    "lin1": init_conv1d(next(keys), channels, cfg.bn_channels, 1, bias=False),
                    "bn2": _init_bn(cfg.bn_channels),
                    "conv": init_conv1d(
                        next(keys), cfg.bn_channels, cfg.growth_rate, cfg.kernel_size, bias=False
                    ),
                    # CAM: context-aware masking on the layer output
                    "cam_lin1": init_dense(next(keys), cfg.growth_rate, cfg.bn_channels // 2),
                    "cam_lin2": init_dense(next(keys), cfg.bn_channels // 2, cfg.growth_rate),
                }
            )
            channels += cfg.growth_rate
        transit = {
            "bn": _init_bn(channels),
            "lin": init_conv1d(next(keys), channels, channels // 2, 1, bias=False),
        }
        channels //= 2
        blocks.append({"layers": layers, "transit": transit})
    params["blocks"] = blocks
    params["out_bn"] = _init_bn(channels)
    params["embedding"] = init_dense(next(keys), channels * 2, cfg.embedding_size)
    return params


def _cam_mask(lp, y: jnp.ndarray) -> jnp.ndarray:
    """Context-aware masking: sigmoid gate from global + segment context."""
    g = jnp.mean(y, axis=2, keepdims=True)  # global context (B, C, 1)
    seg = 100
    t = y.shape[2]
    pad = (-t) % seg
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
    s = yp.reshape(y.shape[0], y.shape[1], -1, seg).mean(axis=3)  # (B, C, S)
    s = jnp.repeat(s, seg, axis=2)[:, :, :t]
    ctx = (g + s).transpose(0, 2, 1)  # (B, T, C)
    m = dense(lp["cam_lin2"], jax.nn.relu(dense(lp["cam_lin1"], ctx)))
    return jax.nn.sigmoid(m).transpose(0, 2, 1)


def campplus_forward(params: dict, cfg: CAMPPlusConfig, fbank: jnp.ndarray) -> jnp.ndarray:
    """fbank (B, T, feat_dim), already CMN-normalized -> (B, embedding_size)."""
    x = fbank.transpose(0, 2, 1)[:, None]  # (B, 1, F, T)
    f = params["fcm"]
    x = jax.nn.relu(_bn2d(f["bn1"], _conv2d(f["conv1"], x, stride=(2, 1))))
    x = jax.nn.relu(_bn2d(f["bn2"], _conv2d(f["conv2"], x, stride=(2, 1))))
    b, c, fr, t = x.shape
    x = x.reshape(b, c * fr, t)  # (B, 640, T)

    x = conv1d(params["stem"]["conv"], x, padding=2)
    x = jax.nn.relu(_bn(params["stem"]["bn"], x))

    for blk, dil in zip(params["blocks"], cfg.block_dilations):
        for lp in blk["layers"]:
            h = jax.nn.relu(_bn(lp["bn1"], x))
            h = conv1d(lp["lin1"], h)
            h = jax.nn.relu(_bn(lp["bn2"], h))
            pad = dil * (cfg.kernel_size - 1) // 2
            h = conv1d(lp["conv"], h, padding=pad, dilation=dil)
            h = h * _cam_mask(lp, h)
            x = jnp.concatenate([x, h], axis=1)  # dense connection
        h = jax.nn.relu(_bn(blk["transit"]["bn"], x))
        x = conv1d(blk["transit"]["lin"], h)

    x = jax.nn.relu(_bn(params["out_bn"], x))
    mean = jnp.mean(x, axis=2)
    std = jnp.sqrt(jnp.clip(jnp.var(x, axis=2), min=1e-7))
    stats = jnp.concatenate([mean, std], axis=1)
    return dense(params["embedding"], stats)


def kaldi_fbank_cmn(wav_16k: jnp.ndarray, num_mel_bins: int = 80) -> jnp.ndarray:
    """Kaldi-style log-mel fbank (25 ms / 10 ms, povey window approximated by
    hann, dither off) with utterance CMN — the CAM++ input features
    (reference frontend.py:276-283).  wav (B, T) -> (B, frames, bins)."""
    import numpy as np

    from cosyvoice2_eu_tpu.ops.mel import mel_filterbank
    from cosyvoice2_eu_tpu.ops.stft import frame

    sr, win, hop = 16000, 400, 160
    x = wav_16k * 32768.0  # kaldi int16 scaling
    frames = frame(x, win, hop)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove DC
    # povey window = hann ** 0.85
    n = np.arange(win)
    w = (0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))) ** 0.85
    frames = frames * jnp.asarray(w, x.dtype)
    pad_to = 512
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad_to - win)))
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    basis = jnp.asarray(
        mel_filterbank(sr, pad_to, num_mel_bins, fmin=20.0, htk=True, norm=None)
    )
    mel = jnp.einsum("mf,btf->btm", basis, spec)
    logmel = jnp.log(jnp.clip(mel, min=1.19209290e-07))
    return logmel - jnp.mean(logmel, axis=1, keepdims=True)  # CMN
