"""Qwen2 decoder backbone in pure JAX (GQA + RoPE + RMSNorm).

TPU-native replacement for the reference's HF ``Qwen2ForCausalLM`` backbone
(reference: cosy_repo/cosyvoice/llm/llm.py:46 HFBackbone; consumed via
``inputs_embeds`` only — CosyVoice2 reads the final hidden states and applies
its own ``llm_decoder`` head, so no lm_head is materialized here).

Decode uses a pre-allocated HBM KV cache of static length; the autoregressive
loop lives in ``lax.while_loop`` (models/llm.py).  Attention masks are built
from explicit valid-position sets, which lets prompt buckets be right-padded
without fragmenting the cache.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import Qwen2Config
from cosyvoice2_eu_tpu.ops.masks import NEG_INF
from cosyvoice2_eu_tpu.utils.params import (
    dense,
    init_dense,
    init_embedding,
    init_rms_norm,
    rms_norm,
)


class KVCache(NamedTuple):
    """Static-shape KV cache: (layers, B, n_kv_heads, max_len, head_dim)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def init_qwen2(rng, cfg: Qwen2Config) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 2)
    layers = []
    h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], 7)
        layer = {
            "input_layernorm": init_rms_norm(h),
            "q_proj": init_dense(ks[0], h, q_dim, bias=cfg.attention_bias),
            "k_proj": init_dense(ks[1], h, kv_dim, bias=cfg.attention_bias),
            "v_proj": init_dense(ks[2], h, kv_dim, bias=cfg.attention_bias),
            "o_proj": init_dense(ks[3], q_dim, h, bias=False),
            "post_attention_layernorm": init_rms_norm(h),
            "gate_proj": init_dense(ks[4], h, cfg.intermediate_size, bias=False),
            "up_proj": init_dense(ks[5], h, cfg.intermediate_size, bias=False),
            "down_proj": init_dense(ks[6], cfg.intermediate_size, h, bias=False),
        }
        if cfg.use_qk_norm:
            layer["q_norm"] = init_rms_norm(cfg.head_dim)
            layer["k_norm"] = init_rms_norm(cfg.head_dim)
        layers.append(layer)
    return {
        "embed_tokens": init_embedding(keys[-2], cfg.vocab_size, h),
        "layers": layers,
        "norm": init_rms_norm(h),
    }


def rope_cos_sin(positions: jnp.ndarray, cfg: Qwen2Config, dtype=jnp.float32):
    """positions: (..., T) int32 -> cos/sin (..., T, head_dim)."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., T, half)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, T, D); cos/sin: (B, T, D) or (T, D)."""
    cos, sin = cos.astype(x.dtype), sin.astype(x.dtype)
    if cos.ndim == 2:
        cos, sin = cos[None, None], sin[None, None]
    else:
        cos, sin = cos[:, None], sin[:, None]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def _attention(q, k, v, bias, num_groups: int):
    """q: (B, Hq, Tq, D); k,v: (B, Hkv, Tk, D); bias: (B, 1, Tq, Tk)."""
    b, hq, tq, d = q.shape
    hkv = k.shape[1]
    q = q.reshape(b, hkv, num_groups, tq, d)
    scores = jnp.einsum("bhgqd,bhkd->bhgqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    scores = scores.astype(jnp.float32) + bias[:, :, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs, v)
    return out.reshape(b, hq, tq, d)


def _layer_forward(lp, cfg: Qwen2Config, x, cos, sin, bias, kv=None, layer_idx=0,
                   write_at=None, attn_len=None):
    """One decoder layer.  If kv is given, k/v are written at ``write_at`` and
    attention runs over the full cache — or only its first ``attn_len`` slots
    when set (prefill: slots past the prompt window are unwritten and masked,
    so attending over them is pure wasted score/softmax work)."""
    b, t, _ = x.shape
    h = rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
    q = dense(lp["q_proj"], h).reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = dense(lp["k_proj"], h).reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = dense(lp["v_proj"], h).reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    if "q_norm" in lp:  # qwen3-style per-head norms (applied pre-RoPE)
        q = rms_norm(lp["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(lp["k_norm"], k, cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if kv is not None:
        if getattr(write_at, "ndim", 0):
            # per-row slot positions (continuous-batching decode): each batch
            # row writes its single new K/V at its own cache index.  One-hot
            # masked write — pure broadcast select, the TPU-friendliest form
            # (scatter and unrolled DUS both stressed the compiler here).
            slot_pos = jnp.arange(kv.k.shape[3], dtype=jnp.int32)
            onehot = (slot_pos[None, :] == write_at[:, None])[:, None, :, None]
            k_cache = jnp.where(
                onehot, k[:, :, 0, :][:, :, None, :].astype(kv.k.dtype), kv.k[layer_idx]
            )
            v_cache = jnp.where(
                onehot, v[:, :, 0, :][:, :, None, :].astype(kv.v.dtype), kv.v[layer_idx]
            )
        else:
            k_cache = jax.lax.dynamic_update_slice(
                kv.k[layer_idx], k.astype(kv.k.dtype), (0, 0, write_at, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                kv.v[layer_idx], v.astype(kv.v.dtype), (0, 0, write_at, 0)
            )
        new_kv = KVCache(kv.k.at[layer_idx].set(k_cache), kv.v.at[layer_idx].set(v_cache))
        k_att = k_cache if attn_len is None else k_cache[:, :, :attn_len]
        v_att = v_cache if attn_len is None else v_cache[:, :, :attn_len]
        att = _attention(q, k_att.astype(q.dtype), v_att.astype(q.dtype), bias,
                         cfg.num_heads // cfg.num_kv_heads)
    else:
        new_kv = None
        att = _attention(q, k, v, bias, cfg.num_heads // cfg.num_kv_heads)

    att = att.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * cfg.head_dim)
    x = x + dense(lp["o_proj"], att)

    h = rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
    gated = jax.nn.silu(dense(lp["gate_proj"], h)) * dense(lp["up_proj"], h)
    x = x + dense(lp["down_proj"], gated)
    return x, new_kv


def qwen2_forward(params, cfg: Qwen2Config, embeds: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Full (training / no-cache) forward.

    embeds: (B, T, H); valid: (B, T) bool -> final hidden states (B, T, H).
    Causal attention restricted to valid positions.
    """
    b, t, _ = embeds.shape
    causal = jnp.tril(jnp.ones((t, t), bool))
    mask = causal[None] & valid[:, None, :]
    bias = jnp.where(mask, 0.0, NEG_INF)[:, None]  # (B, 1, T, T)
    pos = jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(pos, cfg)
    x = embeds
    for i, lp in enumerate(params["layers"]):
        x, _ = _layer_forward(lp, cfg, x, cos, sin, bias)
    return rms_norm(params["norm"], x, cfg.rms_norm_eps)


def qwen2_prefill(params, cfg: Qwen2Config, embeds, prompt_len, kv: KVCache):
    """Prefill the KV cache with a right-padded prompt.

    embeds: (B, P_bucket, H); prompt_len: (B,) actual lengths.  K/V are written
    to cache slots [0, P_bucket); pad slots are masked in all later attention.
    Returns (last_valid_hidden (B, H), kv).
    """
    b, p, _ = embeds.shape
    pos_idx = jnp.arange(p, dtype=jnp.int32)
    # attention runs over the PROMPT WINDOW only (cache slots >= p are
    # unwritten during prefill and masked): query i sees slot j iff j <= i
    # (causal within the prompt) and j < prompt_len (no pad slots).
    # Restricting the scores to (P, P) instead of (P, max_cache) cuts the
    # prefill's attention work ~(max_cache/P)x at identical results.
    slot = jnp.arange(p, dtype=jnp.int32)
    mask = (slot[None, None, :] <= pos_idx[None, :, None]) & (
        slot[None, None, :] < prompt_len[:, None, None]
    )
    bias = jnp.where(mask, 0.0, NEG_INF)[:, None]  # (B, 1, P, P)
    cos, sin = rope_cos_sin(pos_idx, cfg)

    x = embeds
    for i, lp in enumerate(params["layers"]):
        x, kv = _layer_forward(
            lp, cfg, x, cos, sin, bias, kv=kv, layer_idx=i, write_at=0,
            attn_len=p,
        )
    x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    last = jnp.take_along_axis(x, (prompt_len - 1)[:, None, None], axis=1)[:, 0]
    return last, kv


def qwen2_decode_step(params, cfg: Qwen2Config, embed, rope_pos, cache_index, valid_mask, kv: KVCache):
    """One AR step.

    embed: (B, H) token embedding; rope_pos: (B,) true sequence position;
    cache_index: scalar int32 cache slot to write; valid_mask: (B, max_len)
    bool of cache slots visible to this query (already includes the new slot).
    Returns (hidden (B, H), kv).
    """
    b = embed.shape[0]
    x = embed[:, None, :]
    bias = jnp.where(valid_mask, 0.0, NEG_INF)[:, None, None]  # (B,1,1,max_len)
    cos, sin = rope_cos_sin(rope_pos[:, None], cfg)  # (B,1,D)
    for i, lp in enumerate(params["layers"]):
        x, kv = _layer_forward(
            lp, cfg, x, cos, sin, bias, kv=kv, layer_idx=i, write_at=cache_index
        )
    x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return x[:, 0], kv
