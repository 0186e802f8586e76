"""InterpolateRegulator: linear time-resampling + smoothing conv stack.

Reference: cosy_repo/cosyvoice/flow/length_regulator.py:21.  v1's flow
stretches encoder output (one vector per speech token, 50 Hz) to the mel
frame rate (22050/256 Hz) by 1-D linear interpolation, then smooths with a
stack of [Conv1d(k3) -> GroupNorm -> Mish] blocks and projects with a 1x1
conv.  Inference interpolates the prompt and the generated head/mid/tail
separately so the prompt/generation boundary lands on an exact frame
(length_regulator.py:52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import LengthRegulatorConfig
from cosyvoice2_eu_tpu.utils.params import (
    conv1d,
    group_norm,
    init_conv1d,
    init_group_norm,
)

_mish = lambda x: x * jnp.tanh(jax.nn.softplus(x))


def linear_interpolate(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) over the last
    axis.  x: (B, C, T) -> (B, C, out_len)."""
    t_in = x.shape[-1]
    if out_len == 0:  # degenerate sub-hop prompt: no frames to emit
        return x[..., :0]
    scale = t_in / out_len
    # sample positions: centers of output cells mapped into input coordinates
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (pos - lo.astype(jnp.float32)).astype(x.dtype)
    return x[..., lo] * (1.0 - w) + x[..., hi] * w


def init_length_regulator(rng, cfg: LengthRegulatorConfig) -> dict:
    ks = jax.random.split(rng, len(cfg.sampling_ratios) + 1)
    blocks = [
        {"conv": init_conv1d(ks[i], cfg.channels, cfg.channels, 3),
         "norm": init_group_norm(cfg.channels)}
        for i in range(len(cfg.sampling_ratios))
    ]
    return {"blocks": blocks, "proj": init_conv1d(ks[-1], cfg.channels, cfg.channels, 1)}


def _conv_stack(params: dict, cfg: LengthRegulatorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, T)."""
    for bp in params["blocks"]:
        x = conv1d(bp["conv"], x, padding=1)
        x = group_norm(bp["norm"], x, cfg.groups)
        x = _mish(x)
    return conv1d(params["proj"], x)


def length_regulator_forward(
    params: dict, cfg: LengthRegulatorConfig, x: jnp.ndarray, out_len: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Training-path forward (length_regulator.py:44).

    x: (B, T, C) -> (B, out_len, C); mask: (B, out_len) bool or None.
    """
    h = linear_interpolate(x.transpose(0, 2, 1), out_len)
    out = _conv_stack(params, cfg, h).transpose(0, 2, 1)
    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)
    return out


def length_regulator_inference(
    params: dict,
    cfg: LengthRegulatorConfig,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mel_len1: int,
    mel_len2: int,
    input_frame_rate: int = 50,
    sample_rate: int = 22050,
    mel_hop: int = 256,
) -> jnp.ndarray:
    """Inference-path forward (length_regulator.py:52).

    x1: (B, T1, C) prompt-token vectors, x2: (B, T2, C) generated; when the
    generation is long enough (> 40 tokens), its first/last 20 tokens are
    interpolated separately (20 tokens == token_overlap_len, cli/model.py)
    so chunk boundaries land on exact frames.  Returns (B, mel_len1+mel_len2, C).
    """
    x2 = x2.transpose(0, 2, 1)
    if x2.shape[-1] > 40:
        edge = int(20 / input_frame_rate * sample_rate / mel_hop)
        head = linear_interpolate(x2[..., :20], edge)
        mid = linear_interpolate(x2[..., 20:-20], mel_len2 - 2 * edge)
        tail = linear_interpolate(x2[..., -20:], edge)
        x2 = jnp.concatenate([head, mid, tail], axis=-1)
    else:
        x2 = linear_interpolate(x2, mel_len2)
    if x1.shape[1] != 0:
        x1 = linear_interpolate(x1.transpose(0, 2, 1), mel_len1)
        h = jnp.concatenate([x1, x2], axis=-1)
    else:
        h = x2
    return _conv_stack(params, cfg, h).transpose(0, 2, 1)
