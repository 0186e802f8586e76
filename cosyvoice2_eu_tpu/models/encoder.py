"""Upsample conformer encoder of the flow-matching mel decoder.

TPU-native re-expression of the reference UpsampleConformerEncoder
(reference: cosy_repo/cosyvoice/transformer/upsample_encoder.py:105):
linear input embed + ESPnet relative-position conformer blocks (no CNN module,
no macaron), a 3-token PreLookahead conv, 2x nearest upsample + causal conv,
then 4 more conformer blocks.  Streaming uses static chunk attention masks
(25 tokens pre-upsample / 50 mel frames post-upsample); everything is built
with static shapes + boolean masks so one compiled program serves all lengths
within a bucket.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import ConformerConfig
from cosyvoice2_eu_tpu.ops.masks import NEG_INF, chunk_attention_mask, make_non_pad_mask
from cosyvoice2_eu_tpu.utils.params import (
    conv1d,
    dense,
    init_conv1d,
    init_dense,
    init_layer_norm,
    layer_norm,
)


# ---------------------------------------------------------------------------
# ESPnet relative positional encoding (embedding.py:201)
# ---------------------------------------------------------------------------

def espnet_rel_pos_emb(size: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Relative position embeddings for offsets [size-1 .. -(size-1)].

    Returns (2*size-1, d_model); row 0 is relative offset +(size-1) (most
    distant past key), row size-1 is offset 0, matching the slice the
    reference takes from its precomputed table (embedding.py:274-283).
    """
    pos = np.arange(size, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((size, d_model), np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((size, d_model), np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)  # (2*size-1, d)
    return jnp.asarray(pe, dtype)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (attention.py:225).

    x: (B, H, T, 2T-1) -> (B, H, T, T) keeping key positions 0..T-1.
    """
    b, h, t, n = x.shape
    zero = jnp.zeros((b, h, t, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1).reshape(b, h, n + 1, t)
    x = xp[:, :, 1:].reshape(b, h, t, n)
    return x[..., : n // 2 + 1]


def init_rel_attention(rng, heads: int, dim: int) -> dict:
    ks = jax.random.split(rng, 6)
    d_k = dim // heads
    bound = math.sqrt(6.0 / (heads + d_k) / 2)  # xavier_uniform-ish for (h, d_k)
    return {
        "linear_q": init_dense(ks[0], dim, dim),
        "linear_k": init_dense(ks[1], dim, dim),
        "linear_v": init_dense(ks[2], dim, dim),
        "linear_out": init_dense(ks[3], dim, dim),
        "linear_pos": init_dense(ks[4], dim, dim, bias=False),
        "pos_bias_u": jax.random.uniform(ks[5], (heads, d_k), jnp.float32, -bound, bound),
        "pos_bias_v": jax.random.uniform(jax.random.fold_in(ks[5], 1), (heads, d_k), jnp.float32, -bound, bound),
    }


def rel_attention(p: dict, heads: int, x: jnp.ndarray, pos_emb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Relative-position MHA (attention.py:200 RelPositionMultiHeadedAttention).

    x: (B, T, D); pos_emb: (2T-1, D); mask: (B, T, T) bool.
    """
    b, t, dim = x.shape
    d_k = dim // heads
    q = dense(p["linear_q"], x).reshape(b, t, heads, d_k)
    k = dense(p["linear_k"], x).reshape(b, t, heads, d_k).transpose(0, 2, 1, 3)
    v = dense(p["linear_v"], x).reshape(b, t, heads, d_k).transpose(0, 2, 1, 3)
    pe = dense(p["linear_pos"], pos_emb).reshape(-1, heads, d_k).transpose(1, 0, 2)  # (H, 2T-1, dk)

    q_u = (q + p["pos_bias_u"].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"].astype(x.dtype)).transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,hnd->bhqn", q_v, pe)  # (B, H, T, 2T-1)
    bd = rel_shift(bd)
    scores = (ac + bd) / math.sqrt(d_k)
    scores = scores.astype(jnp.float32) + jnp.where(mask, 0.0, NEG_INF)[:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, dim)
    return dense(p["linear_out"], out)


# ---------------------------------------------------------------------------
# conformer blocks (encoder_layer.py:109, no macaron / no CNN variant)
# ---------------------------------------------------------------------------

def init_conformer_layer(rng, cfg: ConformerConfig) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    d = cfg.output_size
    return {
        "self_attn": init_rel_attention(k1, cfg.attention_heads, d),
        "ffn_w1": init_dense(k2, d, cfg.linear_units),
        "ffn_w2": init_dense(k3, cfg.linear_units, d),
        "norm_mha": init_layer_norm(d),
        "norm_ff": init_layer_norm(d),
    }


def conformer_layer(p: dict, cfg: ConformerConfig, x, pos_emb, mask):
    h = layer_norm(p["norm_mha"], x, cfg.layer_norm_eps)
    x = x + rel_attention(p["self_attn"], cfg.attention_heads, h, pos_emb, mask)
    h = layer_norm(p["norm_ff"], x, cfg.layer_norm_eps)
    h = dense(p["ffn_w2"], jax.nn.silu(dense(p["ffn_w1"], h)))
    return x + h


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------

def init_upsample_conformer(rng, cfg: ConformerConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_blocks + cfg.num_up_blocks + 6)
    d = cfg.output_size
    stride = cfg.upsample_stride
    return {
        "embed": {"linear": init_dense(keys[0], cfg.input_size, d), "norm": init_layer_norm(d)},
        "pre_lookahead": {
            "conv1": init_conv1d(keys[1], d, d, cfg.pre_lookahead_len + 1),
            "conv2": init_conv1d(keys[2], d, d, 3),
        },
        "encoders": [init_conformer_layer(keys[3 + i], cfg) for i in range(cfg.num_blocks)],
        "up_layer": init_conv1d(keys[3 + cfg.num_blocks], d, d, stride * 2 + 1),
        "up_embed": {
            "linear": init_dense(keys[4 + cfg.num_blocks], cfg.input_size, d),
            "norm": init_layer_norm(d),
        },
        "up_encoders": [
            init_conformer_layer(keys[5 + cfg.num_blocks + i], cfg)
            for i in range(cfg.num_up_blocks)
        ],
        "after_norm": init_layer_norm(d),
    }


def _embed(p, x, d_model):
    """LinearNoSubsampling + EspnetRelPositionalEncoding scale (subsampling.py:69)."""
    x = dense(p["linear"], x)
    x = layer_norm(p["norm"], x, eps=1e-5)
    return x * math.sqrt(d_model)


def _pre_lookahead(p, x, lookahead_len: int, context: jnp.ndarray | None = None):
    """(B, T, D) -> (B, T, D).  Right-context conv (upsample_encoder.py:66).

    In chunked streaming the reference feeds the next chunk's first 3 tokens
    as ``context`` instead of zero-padding (upsample_encoder.py:81-93).
    """
    h = x.transpose(0, 2, 1)  # (B, D, T)
    if context is not None:
        ctx = context.transpose(0, 2, 1)
        h = jnp.concatenate([h, ctx], axis=2)
    else:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, lookahead_len)))
    h = jax.nn.leaky_relu(conv1d(p["conv1"], h), 0.01)
    h = jnp.pad(h, ((0, 0), (0, 0), (2, 0)))
    h = conv1d(p["conv2"], h)
    return h.transpose(0, 2, 1) + x


def upsample_conformer_forward(
    params: dict,
    cfg: ConformerConfig,
    xs: jnp.ndarray,
    xs_lens: jnp.ndarray,
    context: jnp.ndarray | None = None,
    streaming: bool = False,
):
    """xs: (B, T, input_size); xs_lens: (B,).

    Returns (ys (B, T*stride, output_size), ys_lens (B,)).
    """
    b, t, _ = xs.shape
    d = cfg.output_size
    stride = cfg.upsample_stride

    # zero pad slots after the embed's LayerNorm so the right-context conv in
    # the PreLookahead layer sees true zeros (matching the reference's
    # exact-shape F.pad), not LN-bias garbage
    valid = make_non_pad_mask(xs_lens, t)[..., None].astype(xs.dtype)
    x = _embed(params["embed"], xs, d) * valid
    if context is not None:
        ctx = _embed(params["embed"], context, d)
    else:
        ctx = None
    pos_emb = espnet_rel_pos_emb(t, d, x.dtype)
    chunk = cfg.static_chunk_size if streaming else 0
    mask = chunk_attention_mask(xs_lens, t, chunk)

    x = _pre_lookahead(params["pre_lookahead"], x, cfg.pre_lookahead_len, ctx)
    for lp in params["encoders"]:
        x = conformer_layer(lp, cfg, x, pos_emb, mask)

    # 2x nearest upsample + causal conv (upsample_encoder.py:37 Upsample1D)
    h = x.transpose(0, 2, 1)  # (B, D, T)
    h = jnp.repeat(h, stride, axis=2)
    h = jnp.pad(h, ((0, 0), (0, 0), (stride * 2, 0)))
    h = conv1d(params["up_layer"], h)
    x = h.transpose(0, 2, 1)
    up_lens = xs_lens * stride

    t_up = t * stride
    valid_up = make_non_pad_mask(up_lens, t_up)[..., None].astype(x.dtype)
    x = _embed(params["up_embed"], x, d) * valid_up
    pos_emb_up = espnet_rel_pos_emb(t_up, d, x.dtype)
    chunk_up = cfg.static_chunk_size * stride if streaming else 0
    mask_up = chunk_attention_mask(up_lens, t_up, chunk_up)
    for lp in params["up_encoders"]:
        x = conformer_layer(lp, cfg, x, pos_emb_up, mask_up)

    x = layer_norm(params["after_norm"], x, eps=1e-5)
    return x, up_lens
