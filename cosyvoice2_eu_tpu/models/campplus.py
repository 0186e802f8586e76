"""CAM++ speaker-embedding network (x-vector extractor).

TPU-native replacement for the reference's ``campplus.onnx`` (ONNX Runtime
binary, consumed at cosy_repo/cosyvoice/cli/frontend.py:276-283 and
tools/extract_embedding.py:24-35; no Python source in-tree).  Topology
follows the public 3D-Speaker CAM++ design the ONNX was exported from:

  FCM 2-D front-end: conv3x3 + 2 residual stages (2 BasicResBlocks each,
  frequency stride 2) + conv3x3 stride (2,1)  => (B, 32 * feat/8, T)
  -> TDNN stem (k5, time stride 2)
  -> 3 dense-TDNN blocks (12/24/16 layers, growth 32, bottleneck 128,
     dilations 1/2/2), each layer gated by context-aware masking (CAM:
     sigmoid gate from global mean + 100-frame segment pooling of the
     bottleneck activations), transit 1x1 halving channels after each block
  -> BN+ReLU -> stats pooling (mean ++ unbiased std) -> 1x1 dense + BN
  => 192-d embedding.

Input: 80-bin kaldi fbank with per-utterance mean subtraction (CMN), 16 kHz.
Weights convert from the ONNX graph via runtime/onnx_convert.py, verified
cosine against the numpy graph executor (runtime/onnx_exec.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.utils.params import conv1d, init_conv1d


@dataclasses.dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    fcm_channels: int = 32
    fcm_blocks: tuple = (2, 2)
    init_channels: int = 128
    growth_rate: int = 32
    bn_channels: int = 128  # bottleneck inside dense layers (bn_size 4 x growth)
    block_layers: tuple = (12, 24, 16)
    block_dilations: tuple = (1, 2, 2)
    kernel_size: int = 3
    seg_len: int = 100  # CAM segment pooling window


def tiny_campplus_config() -> CAMPPlusConfig:
    return CAMPPlusConfig(
        feat_dim=16, embedding_size=32, fcm_channels=4, fcm_blocks=(1, 1),
        init_channels=16, growth_rate=8, bn_channels=12,
        block_layers=(2, 2), block_dilations=(1, 2), seg_len=8,
    )


def _init_bn(c):
    return {
        "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _bn(p, x, eps=1e-5):
    """BatchNorm (inference mode) over channel axis 1 of (B, C, ...)."""
    w = (p["weight"] / jnp.sqrt(p["var"] + eps)).astype(x.dtype)
    b = (p["bias"] - p["mean"] * w).astype(x.dtype)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return x * w.reshape(shape) + b.reshape(shape)


def _init_conv2d(rng, cin, cout, k, bias=False):
    import math

    fan_in = cin * k * k
    bound = math.sqrt(1.0 / fan_in)
    k1, k2 = jax.random.split(rng)
    p = {"weight": jax.random.uniform(k1, (cout, cin, k, k), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def _conv2d(p, x, stride=(1, 1), padding=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None]
    return y


def _init_resblock(keys, cin, cout, stride):
    p = {
        "conv1": _init_conv2d(keys[0], cin, cout, 3),
        "bn1": _init_bn(cout),
        "conv2": _init_conv2d(keys[1], cout, cout, 3),
        "bn2": _init_bn(cout),
    }
    if stride != 1 or cin != cout:
        p["shortcut_conv"] = _init_conv2d(keys[2], cin, cout, 1)
        p["shortcut_bn"] = _init_bn(cout)
    return p


def _resblock(p, x, stride):
    """BasicResBlock: frequency-strided 3x3 convs + identity/projection."""
    h = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x, stride=(stride, 1))))
    h = _bn(p["bn2"], _conv2d(p["conv2"], h))
    if "shortcut_conv" in p:
        x = _bn(p["shortcut_bn"], _conv2d(p["shortcut_conv"], x, stride=(stride, 1), padding=(0, 0)))
    return jax.nn.relu(h + x)


def init_campplus(rng, cfg: CAMPPlusConfig) -> dict:
    keys = iter(jax.random.split(rng, 4096))

    def nk(n=1):
        return [next(keys) for _ in range(n)]

    fc = cfg.fcm_channels
    head = {
        "conv1": _init_conv2d(next(keys), 1, fc, 3),
        "bn1": _init_bn(fc),
        "conv2": _init_conv2d(next(keys), fc, fc, 3),
        "bn2": _init_bn(fc),
    }
    for li, n_blocks in enumerate(cfg.fcm_blocks):
        stage = []
        for bi in range(n_blocks):
            stride = 2 if bi == 0 else 1
            stage.append(_init_resblock(nk(3), fc, fc, stride))
        head[f"layer{li + 1}"] = stage
    params = {"head": head}

    stem_in = fc * (cfg.feat_dim // (2 ** (len(cfg.fcm_blocks) + 1)))
    params["tdnn"] = {
        "linear": init_conv1d(next(keys), stem_in, cfg.init_channels, 5, bias=False),
        "bn": _init_bn(cfg.init_channels),
    }
    channels = cfg.init_channels
    blocks, transits = [], []
    for n_layers in cfg.block_layers:
        layers = []
        for _ in range(n_layers):
            layers.append(
                {
                    "bn1": _init_bn(channels),
                    "lin1": init_conv1d(next(keys), channels, cfg.bn_channels, 1, bias=False),
                    "bn2": _init_bn(cfg.bn_channels),
                    # CAMLayer: local conv + sigmoid gate from context
                    "local": init_conv1d(
                        next(keys), cfg.bn_channels, cfg.growth_rate, cfg.kernel_size, bias=False
                    ),
                    "gate1": init_conv1d(next(keys), cfg.bn_channels, cfg.bn_channels // 2, 1),
                    "gate2": init_conv1d(next(keys), cfg.bn_channels // 2, cfg.growth_rate, 1),
                }
            )
            channels += cfg.growth_rate
        blocks.append({"layers": layers})
        transits.append(
            {
                "bn": _init_bn(channels),
                "lin": init_conv1d(next(keys), channels, channels // 2, 1, bias=False),
            }
        )
        channels //= 2
    params["blocks"] = blocks
    params["transits"] = transits
    params["out_bn"] = _init_bn(channels)
    params["dense"] = {
        "lin": init_conv1d(next(keys), channels * 2, cfg.embedding_size, 1, bias=False),
        "bn": _init_bn(cfg.embedding_size),
    }
    return params


def _seg_pool(x: jnp.ndarray, seg: int) -> jnp.ndarray:
    """avg_pool1d(k=seg, s=seg, ceil_mode) then nearest-expand back to T.

    The partial tail segment averages over its true length (torch avg_pool
    divides by the window's overlap with the input when ceil_mode clips)."""
    b, c, t = x.shape
    pad = (-t) % seg
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    sums = xp.reshape(b, c, -1, seg).sum(axis=3)
    counts = jnp.minimum(
        jnp.arange(sums.shape[2]) * seg + seg, t
    ) - jnp.arange(sums.shape[2]) * seg
    means = sums / counts.astype(x.dtype)
    return jnp.repeat(means, seg, axis=2)[:, :, :t]


def _cam_layer(lp, cfg: CAMPPlusConfig, h: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """CAMLayer: local conv gated by context computed from the INPUT h."""
    pad = dilation * (cfg.kernel_size - 1) // 2
    y = conv1d(lp["local"], h, padding=pad, dilation=dilation)
    context = jnp.mean(h, axis=2, keepdims=True) + _seg_pool(h, cfg.seg_len)
    m = jax.nn.sigmoid(conv1d(lp["gate2"], jax.nn.relu(conv1d(lp["gate1"], context))))
    return y * m


def campplus_forward(params: dict, cfg: CAMPPlusConfig, fbank: jnp.ndarray) -> jnp.ndarray:
    """fbank (B, T, feat_dim), already CMN-normalized -> (B, embedding_size)."""
    x = fbank.transpose(0, 2, 1)[:, None]  # (B, 1, F, T)
    head = params["head"]
    x = jax.nn.relu(_bn(head["bn1"], _conv2d(head["conv1"], x)))
    for li in range(len(cfg.fcm_blocks)):
        for bi, bp in enumerate(head[f"layer{li + 1}"]):
            x = _resblock(bp, x, stride=2 if bi == 0 else 1)
    x = jax.nn.relu(_bn(head["bn2"], _conv2d(head["conv2"], x, stride=(2, 1))))
    b, c, fr, t = x.shape
    x = x.reshape(b, c * fr, t)

    x = conv1d(params["tdnn"]["linear"], x, stride=2, padding=2)
    x = jax.nn.relu(_bn(params["tdnn"]["bn"], x))

    for blk, transit, dil in zip(params["blocks"], params["transits"], cfg.block_dilations):
        for lp in blk["layers"]:
            h = jax.nn.relu(_bn(lp["bn1"], x))
            h = conv1d(lp["lin1"], h)
            h = jax.nn.relu(_bn(lp["bn2"], h))
            h = _cam_layer(lp, cfg, h, dil)
            x = jnp.concatenate([x, h], axis=1)  # dense connection
        h = jax.nn.relu(_bn(transit["bn"], x))
        x = conv1d(transit["lin"], h)

    x = jax.nn.relu(_bn(params["out_bn"], x))
    mean = jnp.mean(x, axis=2)
    n = x.shape[2]
    var = jnp.var(x, axis=2) * (n / max(n - 1, 1))  # torch std: unbiased
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.clip(var, min=1e-12))], axis=1)
    emb = conv1d(params["dense"]["lin"], stats[..., None])
    return _bn(params["dense"]["bn"], emb)[..., 0]


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
