"""Supervised semantic speech tokenizer (whisper-style encoder + FSQ).

TPU-native replacement for the reference's ``speech_tokenizer_v2.onnx``
(ONNX Runtime binary, consumed at cosy_repo/cosyvoice/cli/frontend.py:262-274
and tools/extract_speech_token.py:26-40; the reference ships no Python source
for it).  Topology follows the public S3Tokenizer "v2_25hz" design the ONNX
was exported from: two gelu Conv1d layers (strides 2, 2: 100 fps 128-bin
log-mel -> 25 Hz), whisper sinusoidal positions, 6 pre-norm attention blocks
(1280 wide, 20 heads, key projection without bias), then a finite scalar
quantization head: Linear(1280 -> 8), tanh * 0.9990000128746033, round, and a
base-3 positional code => vocab 3^8 = 6561.

Weights are converted from the ONNX graph by runtime/onnx_convert.py and
verified token-exact against the numpy graph executor (runtime/onnx_exec.py).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.ops.masks import NEG_INF, make_non_pad_mask
from cosyvoice2_eu_tpu.utils.params import (
    conv1d,
    dense,
    init_conv1d,
    init_dense,
    init_layer_norm,
    layer_norm,
)

# the exact bound S3Tokenizer's FSQCodebook applies before rounding
FSQ_TANH_SCALE = 0.9990000128746033


@dataclasses.dataclass(frozen=True)
class SpeechTokenizerConfig:
    n_mels: int = 128
    d_model: int = 1280  # whisper-large width
    num_heads: int = 20
    num_layers: int = 6
    ffn_dim: int = 5120
    conv_strides: tuple = (2, 2)  # v2_25hz: 100 fps mel -> 25 Hz tokens
    fsq_dim: int = 8
    fsq_levels: int = 3
    max_frames: int = 3000  # 30 s at 100 fps (frontend.py:263 asserts <= 30 s)

    @property
    def vocab_size(self) -> int:
        return self.fsq_levels**self.fsq_dim  # 6561

    @property
    def downsample(self) -> int:
        out = 1
        for s in self.conv_strides:
            out *= s
        return out


def tiny_tokenizer_config() -> SpeechTokenizerConfig:
    return SpeechTokenizerConfig(
        n_mels=16, d_model=32, num_heads=4, num_layers=2, ffn_dim=64, max_frames=256,
    )


def _sinusoid_pos(length: int, dim: int) -> jnp.ndarray:
    """Whisper's sinusoidal positions."""
    log_timescale = math.log(10000.0) / (dim // 2 - 1)
    inv = jnp.exp(-log_timescale * jnp.arange(dim // 2, dtype=jnp.float32))
    ang = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)


def init_speech_tokenizer(rng, cfg: SpeechTokenizerConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 4)
    d = cfg.d_model

    def attn_block(k):
        ks = jax.random.split(k, 6)
        return {
            "attn_ln": init_layer_norm(d),
            "q": init_dense(ks[0], d, d),
            "k": init_dense(ks[1], d, d, bias=False),
            "v": init_dense(ks[2], d, d),
            "out": init_dense(ks[3], d, d),
            "mlp_ln": init_layer_norm(d),
            "ff1": init_dense(ks[4], d, cfg.ffn_dim),
            "ff2": init_dense(ks[5], cfg.ffn_dim, d),
        }

    return {
        "conv1": init_conv1d(keys[0], cfg.n_mels, d, 3),
        "conv2": init_conv1d(keys[1], d, d, 3),
        "layers": [attn_block(keys[2 + i]) for i in range(cfg.num_layers)],
        "project_down": init_dense(keys[2 + cfg.num_layers], d, cfg.fsq_dim),
    }


def _block(p, cfg, x, bias):
    b, t, d = x.shape
    h = layer_norm(p["attn_ln"], x)
    hd = d // cfg.num_heads
    q = dense(p["q"], h).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    k = dense(p["k"], h).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    v = dense(p["v"], h).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    scores = scores.astype(jnp.float32) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + dense(p["out"], att)
    h = layer_norm(p["mlp_ln"], x)
    return x + dense(p["ff2"], jax.nn.gelu(dense(p["ff1"], h), approximate=False))


def fsq_quantize(z: jnp.ndarray, levels: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Finite scalar quantization with S3Tokenizer's exact semantics.

    h = tanh(z) * half * FSQ_TANH_SCALE; digits = round(h) + half;
    code = sum(digits * levels^i).  Returns (codes int32, quantized z in
    [-1, 1] with straight-through grads).
    """
    half = (levels - 1) / 2.0
    bounded = jnp.tanh(z) * (half * FSQ_TANH_SCALE)
    rounded = jnp.round(bounded)
    quantized = bounded + jax.lax.stop_gradient(rounded - bounded)
    digits = (rounded + half).astype(jnp.int32)  # in [0, levels)
    basis = levels ** jnp.arange(z.shape[-1], dtype=jnp.int32)
    codes = jnp.sum(digits * basis, axis=-1)
    return codes, quantized / half


def fsq_embed(codes: jnp.ndarray, dim: int, levels: int) -> jnp.ndarray:
    """codes -> normalized quantized vector (inverse of fsq_quantize index)."""
    half = (levels - 1) / 2.0
    basis = levels ** jnp.arange(dim, dtype=jnp.int32)
    digits = (codes[..., None] // basis) % levels
    return (digits.astype(jnp.float32) - half) / half


def conv_out_len(length, stride: int, kernel: int = 3, padding: int = 1):
    return (length + 2 * padding - kernel) // stride + 1


def encode(
    params: dict,
    cfg: SpeechTokenizerConfig,
    mel: jnp.ndarray,
    mel_len: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mel (B, n_mels, T at 100 fps) -> (codes (B, T//downsample), code_len).

    Conv front-end: gelu(conv k3 s2) -> gelu(conv k3 s2), whisper positions,
    num_layers attention blocks, then the FSQ head.
    """
    x = jax.nn.gelu(
        conv1d(params["conv1"], mel, stride=cfg.conv_strides[0], padding=1),
        approximate=False,
    )
    x = jax.nn.gelu(
        conv1d(params["conv2"], x, stride=cfg.conv_strides[1], padding=1),
        approximate=False,
    )
    x = x.transpose(0, 2, 1)  # (B, T', D)
    t = x.shape[1]
    if "positional_embedding" in params:  # table frozen into the ONNX export
        x = x + params["positional_embedding"][:t].astype(x.dtype)
    else:
        x = x + _sinusoid_pos(t, cfg.d_model).astype(x.dtype)

    code_len = mel_len
    for s in cfg.conv_strides:
        code_len = conv_out_len(code_len, s)
    valid = make_non_pad_mask(code_len, t)
    bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]
    for p in params["layers"]:
        x = _block(p, cfg, x, bias)

    z = dense(params["project_down"], x)
    codes, _ = fsq_quantize(z, cfg.fsq_levels)
    codes = jnp.where(valid, codes, 0)
    return codes, code_len
