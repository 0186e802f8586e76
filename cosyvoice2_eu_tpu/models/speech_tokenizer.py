"""Supervised semantic speech tokenizer (whisper-style encoder + FSQ).

TPU-native replacement for the reference's ``speech_tokenizer_v2.onnx``
(ONNX Runtime binary, consumed at cosy_repo/cosyvoice/cli/frontend.py:262-274
and tools/extract_speech_token.py:26-40; the reference ships no Python source
for it).  Architecture follows the CosyVoice2 paper's description of the
supervised tokenizer: a Whisper-style audio encoder over 128-bin log-mel at
100 fps, downsampled 4x to the 25 Hz token rate, with a finite scalar
quantization (FSQ) bottleneck of 8 dims x 3 levels = 3^8 = 6561 codes.

Weights are converted from the ONNX graph when available
(runtime/onnx_import.py); until then the module serves training-from-scratch
and interface-compatibility roles.
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


@dataclasses.dataclass(frozen=True)
class SpeechTokenizerConfig:
    n_mels: int = 128
    d_model: int = 1280  # whisper-large width
    num_heads: int = 20
    num_layers_pre: int = 6  # encoder1 (before FSQ)
    num_layers_post: int = 6  # encoder2 (after FSQ; used in ASR training only)
    ffn_dim: int = 5120
    fsq_dim: int = 8
    fsq_levels: int = 3
    max_frames: int = 3000  # 30 s at 100 fps (frontend.py:263 asserts <= 30 s)

    @property
    def vocab_size(self) -> int:
        return self.fsq_levels**self.fsq_dim  # 6561


def tiny_tokenizer_config() -> SpeechTokenizerConfig:
    return SpeechTokenizerConfig(
        n_mels=16, d_model=32, num_heads=4, num_layers_pre=2, num_layers_post=1,
        ffn_dim=64, max_frames=256,
    )


def _sinusoid_pos(length: int, dim: int) -> jnp.ndarray:
    """Whisper's sinusoidal positions."""
    log_timescale = math.log(10000.0) / (dim // 2 - 1)
    inv = jnp.exp(-log_timescale * jnp.arange(dim // 2, dtype=jnp.float32))
    ang = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)


def init_speech_tokenizer(rng, cfg: SpeechTokenizerConfig) -> dict:
    n_layers = cfg.num_layers_pre + cfg.num_layers_post
    keys = jax.random.split(rng, n_layers + 6)
    d = cfg.d_model

    def attn_block(k):
        ks = jax.random.split(k, 6)
        return {
            "norm1": init_layer_norm(d),
            "q": init_dense(ks[0], d, d),
            "k": init_dense(ks[1], d, d, bias=False),
            "v": init_dense(ks[2], d, d),
            "out": init_dense(ks[3], d, d),
            "norm2": init_layer_norm(d),
            "ff1": init_dense(ks[4], d, cfg.ffn_dim),
            "ff2": init_dense(ks[5], cfg.ffn_dim, d),
        }

    return {
        "conv1": init_conv1d(keys[0], cfg.n_mels, d, 3),
        "conv2": init_conv1d(keys[1], d, d, 3),  # stride 2 -> 50 fps
        "conv3": init_conv1d(keys[2], d, d, 3),  # stride 2 -> 25 fps
        "layers_pre": [attn_block(keys[3 + i]) for i in range(cfg.num_layers_pre)],
        "fsq_down": init_dense(keys[3 + n_layers], d, cfg.fsq_dim),
        "fsq_up": init_dense(keys[4 + n_layers], cfg.fsq_dim, d),
        "layers_post": [
            attn_block(keys[3 + cfg.num_layers_pre + i]) for i in range(cfg.num_layers_post)
        ],
        "ln_post": init_layer_norm(d),
    }


def _block(p, cfg, x, bias):
    b, t, d = x.shape
    h = layer_norm(p["norm1"], x)
    hd = d // cfg.num_heads
    q = dense(p["q"], h).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    k = dense(p["k"], h).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    v = dense(p["v"], h).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    scores = scores.astype(jnp.float32) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + dense(p["out"], att)
    h = layer_norm(p["norm2"], x)
    return x + dense(p["ff2"], jax.nn.gelu(dense(p["ff1"], h), approximate=False))


def fsq_quantize(z: jnp.ndarray, levels: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Finite scalar quantization: bound to (-1, 1), round to ``levels`` bins.

    Returns (codes int32 (..., ), quantized z with straight-through grads).
    """
    half = (levels - 1) / 2.0
    bounded = jnp.tanh(z) * half  # in (-half, half)
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


def encode(
    params: dict,
    cfg: SpeechTokenizerConfig,
    mel: jnp.ndarray,
    mel_len: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mel (B, n_mels, T at 100 fps) -> (codes (B, T//4), code_len (B,)).

    Conv front-end: gelu(conv k3) -> gelu(conv k3 s2) -> gelu(conv k3 s2),
    then num_layers_pre transformer blocks and the FSQ head.
    """
    x = jax.nn.gelu(conv1d(params["conv1"], mel, padding=1), approximate=False)
    x = jax.nn.gelu(conv1d(params["conv2"], x, stride=2, padding=1), approximate=False)
    x = jax.nn.gelu(conv1d(params["conv3"], x, stride=2, padding=1), approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T/4, D)
    t = x.shape[1]
    x = x + _sinusoid_pos(t, cfg.d_model).astype(x.dtype)

    code_len = mel_len // 4
    valid = make_non_pad_mask(code_len, t)
    bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]
    for p in params["layers_pre"]:
        x = _block(p, cfg, x, bias)

    z = dense(params["fsq_down"], x)
    codes, _ = fsq_quantize(z, cfg.fsq_levels)
    codes = jnp.where(valid, codes, 0)
    return codes, code_len
