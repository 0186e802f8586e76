"""Functional NN layers over explicit parameter pytrees.

Design: every model component is a pure ``apply(params, x, ...)`` function;
parameters are nested dicts of jnp arrays produced by ``init_*`` helpers.
Weight layouts deliberately match torch conventions —

* dense:          weight (out, in), bias (out,)
* conv1d:         weight (out, in/groups, k), bias (out,)
* conv_transpose: weight (in, out, k), bias (out,)
* embedding:      weight (num, dim)

— so the reference's ``llm.pt/flow.pt/hift.pt`` checkpoints map into these
pytrees key-for-key (see runtime/checkpoint.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _kaiming_uniform(rng, shape, fan_in):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_dense(rng, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    k_w, k_b = jax.random.split(rng)
    p = {"weight": _kaiming_uniform(k_w, (out_dim, in_dim), in_dim)}
    if bias:
        p["bias"] = _kaiming_uniform(k_b, (out_dim,), in_dim)
    return p


def init_conv1d(rng, in_ch: int, out_ch: int, k: int, groups: int = 1, bias: bool = True) -> dict:
    k_w, k_b = jax.random.split(rng)
    fan_in = (in_ch // groups) * k
    p = {"weight": _kaiming_uniform(k_w, (out_ch, in_ch // groups, k), fan_in)}
    if bias:
        p["bias"] = _kaiming_uniform(k_b, (out_ch,), fan_in)
    return p


def init_conv_transpose1d(rng, in_ch: int, out_ch: int, k: int, bias: bool = True) -> dict:
    k_w, k_b = jax.random.split(rng)
    fan_in = out_ch * k  # torch uses in_channels of the *transposed* view
    p = {"weight": _kaiming_uniform(k_w, (in_ch, out_ch, k), fan_in)}
    if bias:
        p["bias"] = _kaiming_uniform(k_b, (out_ch,), fan_in)
    return p


def init_layer_norm(dim: int) -> dict:
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_rms_norm(dim: int) -> dict:
    return {"weight": jnp.ones((dim,))}


def init_group_norm(dim: int) -> dict:
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_embedding(rng, num: int, dim: int) -> dict:
    return {"weight": jax.random.normal(rng, (num, dim)) }


# ---------------------------------------------------------------------------
# functional layers
# ---------------------------------------------------------------------------

def dense(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "weight_q" in p or "weight_q_xla" in p:
        # int8 weight-only: y = (x @ Wq^T) * scale.  On TPU the dequantize
        # must stay inside the kernel (XLA materializes the bf16 copy through
        # HBM, costing ~2.5x the bf16 bytes); the Pallas kernel reads int8
        # from HBM once and converts in VMEM.
        # "weight_q_xla" pins the XLA dequant path: tensor-parallel params are
        # stored under this key (parallel/tp.py) because a pallas_call has no
        # GSPMD partitioning rule — XLA would replicate/all-gather the full
        # int8 weights every decode step, defeating the tp sharding.
        from cosyvoice2_eu_tpu.ops.pallas.int8_matmul import (
            int8_backend, int8_matmul,
        )

        wq = p.get("weight_q", p.get("weight_q_xla"))
        if (
            "weight_q" in p
            and int8_backend() == "pallas"
            and wq.shape[1] % 128 == 0
        ):
            lead = x.shape[:-1]
            y32 = int8_matmul(x.reshape(-1, x.shape[-1]), wq)
            y = (y32 * p["scale"]).astype(x.dtype).reshape(*lead, wq.shape[0])
        else:
            y = (x @ wq.T.astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def quantize_dense(p: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of a dense layer."""
    w = np.asarray(p["weight"], np.float32)
    scale = np.maximum(np.abs(w).max(axis=1), 1e-8) / 127.0
    w_q = np.clip(np.round(w / scale[:, None]), -127, 127).astype(np.int8)
    out = {"weight_q": jnp.asarray(w_q), "scale": jnp.asarray(scale, jnp.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_lm_params(llm: dict) -> dict:
    """Weight-only int8 on the decode-bound projections (backbone
    attention/MLP ``*_proj`` + speech head); embeddings/norms stay
    high precision.  Used by ``load(lm_quant="int8")`` and the bench."""
    llm = dict(llm)
    layers = []
    for lp in llm["backbone"]["layers"]:
        layers.append(
            {
                k: (quantize_dense(v) if k.endswith("_proj") else v)
                for k, v in lp.items()
            }
        )
    llm["backbone"] = dict(llm["backbone"], layers=layers)
    llm["llm_decoder"] = quantize_dense(llm["llm_decoder"])
    return llm


def embedding(p: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["weight"], ids, axis=0)


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # stats in fp32: bf16 mean/variance is too coarse for LN stability
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def rms_norm(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    # match HF Qwen2RMSNorm: compute the norm in fp32
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["weight"].astype(jnp.float32)).astype(x.dtype)


def group_norm(p: dict, x: jnp.ndarray, groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """x: (B, C, T) channel-first like torch.nn.GroupNorm."""
    b, c, t = x.shape
    xg = x.reshape(b, groups, c // groups, t)
    mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
    var = jnp.var(xg, axis=(2, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(b, c, t)
    return y * p["weight"].astype(x.dtype)[None, :, None] + p["bias"].astype(x.dtype)[None, :, None]


def conv1d(
    p: dict,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.Conv1d semantics.  x: (B, C_in, T) -> (B, C_out, T')."""
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None]
    return y


def init_conv2d(rng, in_ch: int, out_ch: int, k: int, bias: bool = True) -> dict:
    k_w, k_b = jax.random.split(rng)
    fan_in = in_ch * k * k
    p = {"weight": _kaiming_uniform(k_w, (out_ch, in_ch, k, k), fan_in)}
    if bias:
        p["bias"] = _kaiming_uniform(k_b, (out_ch,), fan_in)
    return p


def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """torch.nn.Conv2d semantics.  x: (B, C_in, H, W) -> (B, C_out, H', W')."""
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None]
    return y


def init_batch_norm(dim: int) -> dict:
    return {
        "weight": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "running_mean": jnp.zeros((dim,)),
        "running_var": jnp.ones((dim,)),
    }


def batch_norm1d(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode torch.nn.BatchNorm1d over (B, C, T) using running stats."""
    mean = p["running_mean"].astype(jnp.float32)[None, :, None]
    var = p["running_var"].astype(jnp.float32)[None, :, None]
    xf = x.astype(jnp.float32)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32)[None, :, None] + p["bias"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def causal_conv1d(p: dict, x: jnp.ndarray, dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """Left-pad (k-1)*dilation zeros then valid conv (reference CausalConv1d,
    cosy_repo/cosyvoice/flow/decoder.py:36)."""
    k = p["weight"].shape[-1]
    return conv1d(p, x, padding=((k - 1) * dilation, 0), dilation=dilation, groups=groups)


def conv_transpose1d(p: dict, x: jnp.ndarray, stride: int, padding: int = 0) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d semantics.  x: (B, C_in, T) -> (B, C_out, T')."""
    w = p["weight"].astype(x.dtype)  # (in, out, k)
    k = w.shape[-1]
    # torch convtranspose == lhs-dilated conv with flipped kernel, swapped io
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, -1).transpose(1, 0, 2),  # -> (out, in, k)
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None]
    return y


def fold_weight_norm(weight_g: np.ndarray, weight_v: np.ndarray) -> np.ndarray:
    """Collapse torch weight_norm (g * v / ||v||) into a plain weight.

    The reference wraps HiFT/F0-predictor convs in weight_norm
    (hifigan/generator.py:439); at load time we fold it so inference uses
    plain convs (equivalent to remove_weight_norm, generator.py:490).
    """
    axis = tuple(range(1, weight_v.ndim))
    norm = np.sqrt(np.sum(weight_v * weight_v, axis=axis, keepdims=True))
    return weight_g * weight_v / np.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# misc activations
# ---------------------------------------------------------------------------

def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation x + sin^2(ax)/a, channel-wise alpha; x: (B, C, T).

    Reference: cosy_repo/cosyvoice/transformer/activation.py:34 (alpha not in
    log scale for HiFT ResBlocks).
    """
    a = alpha.astype(x.dtype)[None, :, None]
    s = jnp.sin(a * x)
    return x + s * s / (a + 1e-9)


def count_params(tree) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(tree))
