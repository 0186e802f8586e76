"""Causal 1-D U-Net velocity estimator for the CFM mel decoder.

TPU-native re-design of the reference CausalConditionalDecoder
(reference: cosy_repo/cosyvoice/flow/decoder.py:294): input is the channel
concat [x(80), mu(80), spks(80), cond(80)] = 320; one down stage
(CausalResnetBlock1D + n_blocks transformer blocks + causal conv), 12 mid
stages, one up stage with a skip connection, then a causal final block and a
1x1 projection back to 80 mel bins.  All convs are left-padded (causal); the
transformer blocks are diffusers-style pre-LN self-attention + GELU MLP
(third_party/Matcha-TTS/matcha/models/components/transformer.py:138).

Streaming uses chunked attention masks of static_chunk_size=50 mel frames
(decoder.py:439-443); non-streaming uses full bidirectional attention over
valid positions.  The CFG double batch (cond + uncond) rides the leading batch
dim, exactly like the reference's batch-2 estimator call
(flow_matching.py:94-117).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import EstimatorConfig
from cosyvoice2_eu_tpu.ops.masks import NEG_INF, chunk_attention_mask
from cosyvoice2_eu_tpu.utils.params import (
    causal_conv1d,
    conv1d,
    dense,
    init_conv1d,
    init_dense,
    init_layer_norm,
    layer_norm,
)

_mish = lambda x: x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_time_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """(B,) -> (B, dim); matcha SinusoidalPosEmb (decoder.py:14)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


# -- causal conv block: CausalConv1d k3 -> LayerNorm -> Mish (decoder.py:65) --

def init_causal_block(rng, dim, dim_out):
    k1, _ = jax.random.split(rng)
    return {"conv": init_conv1d(k1, dim, dim_out, 3), "norm": init_layer_norm(dim_out)}


def causal_block(p, x, mask):
    """x: (B, C, T); mask: (B, 1, T)."""
    h = causal_conv1d(p["conv"], x * mask)
    h = layer_norm(p["norm"], h.transpose(0, 2, 1)).transpose(0, 2, 1)
    return _mish(h) * mask


def init_causal_resnet(rng, dim, dim_out, time_dim):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "block1": init_causal_block(k1, dim, dim_out),
        "block2": init_causal_block(k2, dim_out, dim_out),
        "mlp": init_dense(k3, time_dim, dim_out),
        "res_conv": init_conv1d(k4, dim, dim_out, 1),
    }


def causal_resnet(p, x, mask, temb):
    h = causal_block(p["block1"], x, mask)
    h = h + dense(p["mlp"], _mish(temb))[:, :, None]
    h = causal_block(p["block2"], h, mask)
    return h + conv1d(p["res_conv"], x * mask)


# -- diffusers BasicTransformerBlock (self-attn + GELU MLP) ------------------

def init_transformer_block(rng, dim, heads, head_dim):
    inner = heads * head_dim
    ks = jax.random.split(rng, 6)
    return {
        "norm1": init_layer_norm(dim),
        "to_q": init_dense(ks[0], dim, inner, bias=False),
        "to_k": init_dense(ks[1], dim, inner, bias=False),
        "to_v": init_dense(ks[2], dim, inner, bias=False),
        "to_out": init_dense(ks[3], inner, dim),
        "norm3": init_layer_norm(dim),
        "ff_in": init_dense(ks[4], dim, 4 * dim),
        "ff_out": init_dense(ks[5], 4 * dim, dim),
    }


def transformer_block(p, x, mask_info, heads):
    """x: (B, T, C); mask_info: (lengths (B,), chunk_size, backend)."""
    b, t, c = x.shape
    lengths, chunk, backend = mask_info
    h = layer_norm(p["norm1"], x)
    inner = p["to_q"]["weight"].shape[0]
    d_k = inner // heads
    q = dense(p["to_q"], h).reshape(b, t, heads, d_k).transpose(0, 2, 1, 3)
    k = dense(p["to_k"], h).reshape(b, t, heads, d_k).transpose(0, 2, 1, 3)
    v = dense(p["to_v"], h).reshape(b, t, heads, d_k).transpose(0, 2, 1, 3)
    if backend == "pallas" and t % 128 == 0:
        from cosyvoice2_eu_tpu.ops.pallas.flash_attention import flash_attention

        att = flash_attention(q, k, v, lengths, chunk_size=chunk, block_q=min(256, t),
                              block_k=min(256, t))
    else:
        attn_mask = chunk_attention_mask(lengths, t, chunk)
        attn_bias = jnp.where(attn_mask, 0.0, NEG_INF)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d_k)
        scores = scores.astype(jnp.float32) + attn_bias[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    att = att.transpose(0, 2, 1, 3).reshape(b, t, inner)
    x = x + dense(p["to_out"], att)
    h = layer_norm(p["norm3"], x)
    h = dense(p["ff_out"], jax.nn.gelu(dense(p["ff_in"], h), approximate=False))
    return x + h


# -- full estimator ----------------------------------------------------------

def init_estimator(rng, cfg: EstimatorConfig) -> dict:
    ch = cfg.channels[0]
    time_dim = ch * 4
    n_stages = 2 + cfg.num_mid_blocks
    keys = iter(jax.random.split(rng, 8 + n_stages * (1 + cfg.n_blocks) + 4))

    def stage(dim_in, dim_out, with_conv):
        s = {
            "resnet": init_causal_resnet(next(keys), dim_in, dim_out, time_dim),
            "transformer": [
                init_transformer_block(next(keys), dim_out, cfg.num_heads, cfg.attention_head_dim)
                for _ in range(cfg.n_blocks)
            ],
        }
        if with_conv:
            s["conv"] = init_conv1d(next(keys), dim_out, dim_out, 3)
        return s

    return {
        "time_mlp": {
            "linear_1": init_dense(next(keys), cfg.in_channels, time_dim),
            "linear_2": init_dense(next(keys), time_dim, time_dim),
        },
        "down": stage(cfg.in_channels, ch, with_conv=True),
        "mid": [stage(ch, ch, with_conv=False) for _ in range(cfg.num_mid_blocks)],
        "up": stage(ch * 2, ch, with_conv=True),
        "final_block": init_causal_block(next(keys), ch, ch),
        "final_proj": init_conv1d(next(keys), ch, cfg.out_channels, 1),
    }


def estimator_forward(
    params: dict,
    cfg: EstimatorConfig,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    t: jnp.ndarray,
    spks: jnp.ndarray,
    cond: jnp.ndarray,
    streaming: bool = False,
    backend: str | None = None,
) -> jnp.ndarray:
    """Predict velocity.

    x/mu/cond: (B, 80, T); mask: (B, 1, T); t: (B,); spks: (B, 80).

    backend: attention backend override; None = auto (pallas on TPU).
    The flash kernel is differentiable (custom VJP with Pallas backward
    kernels, ops/pallas/flash_attention.py), so training uses it too.
    """
    b, _, T = x.shape
    temb = sinusoidal_time_emb(t, cfg.in_channels, cfg.time_embed_scale).astype(x.dtype)
    temb = dense(params["time_mlp"]["linear_1"], temb)
    temb = dense(params["time_mlp"]["linear_2"], jax.nn.silu(temb))

    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, :, None], (b, spks.shape[1], T)), cond], axis=1
    )

    from cosyvoice2_eu_tpu.ops.pallas.flash_attention import attention_backend

    lengths = jnp.sum(mask[:, 0].astype(jnp.int32), axis=-1)
    chunk = cfg.static_chunk_size if streaming else 0
    mask_info = (lengths, chunk, backend or attention_backend())

    def run_blocks(sp, h):
        h = causal_resnet(sp["resnet"], h, mask, temb)
        ht = h.transpose(0, 2, 1)
        for tp in sp["transformer"]:
            ht = transformer_block(tp, ht, mask_info, cfg.num_heads)
        return ht.transpose(0, 2, 1)

    # down stage: skip is captured BEFORE the downsample conv (decoder.py:451)
    h = run_blocks(params["down"], h)
    skip = h
    h = causal_conv1d(params["down"]["conv"], h * mask)
    for sp in params["mid"]:
        h = run_blocks(sp, h)
    h = jnp.concatenate([h, skip], axis=1)
    h = run_blocks(params["up"], h)
    h = causal_conv1d(params["up"]["conv"], h * mask)
    h = causal_block(params["final_block"], h, mask)
    out = conv1d(params["final_proj"], h * mask)
    return out * mask
