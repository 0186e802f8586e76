"""Generic Transformer/Conformer encoder family (the ESPnet-derived zoo).

TPU-native re-expression of the reference encoder zoo
(reference: cosy_repo/cosyvoice/transformer/encoder.py:37 BaseEncoder /
TransformerEncoder / ConformerEncoder, subsampling.py, embedding.py,
attention.py, convolution.py, encoder_layer.py; registries in
utils/class_utils.py:42-76).  The v2 EU synthesis path only needs the
upsample-conformer subset (models/encoder.py); this module covers the rest of
the family — ASR-grade conformers with macaron FFN + convolution module,
whisper-style encoders, all subsampling and positional-encoding variants, and
KV-cached chunk streaming.

TPU-first design decisions (vs the torch reference):

* Everything is a pure ``fn(params, cfg, ...)`` over explicit pytrees with
  **static shapes**; padding is expressed through boolean masks that XLA
  folds into the attention softmax.
* The streaming cache (reference ``forward_chunk``, encoder.py:183) is a
  **fixed-width right-aligned KV window** plus a fill counter instead of a
  dynamically growing tensor: every chunk step runs the same compiled
  program, the torch dynamic ``cat`` + python slicing becomes a concat +
  static slice, and partially-filled cache slots are handled by the mask.
* Positional tables are trace-time numpy constants; streaming offsets index
  them with clamped gathers so the program stays shape-static under jit.

Checkpoint compatibility: ``convert_generic_encoder`` maps the reference
``state_dict()`` key-for-key into these pytrees, which is what the parity
tests in tests/test_generic_encoder.py pin against.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import GenericEncoderConfig
from cosyvoice2_eu_tpu.ops.masks import NEG_INF, chunk_attention_mask, make_non_pad_mask
from cosyvoice2_eu_tpu.models.encoder import espnet_rel_pos_emb, rel_shift
from cosyvoice2_eu_tpu.utils.params import (
    batch_norm1d,
    conv1d,
    conv2d,
    dense,
    embedding,
    init_batch_norm,
    init_conv1d,
    init_conv2d,
    init_dense,
    init_embedding,
    init_layer_norm,
    layer_norm,
)

# the shared name->fn registry (registry.py, the class_utils.py analog)
from cosyvoice2_eu_tpu.registry import ACTIVATIONS as _ACTIVATIONS

# input layers whose right context / subsample rate mirror the reference
# (subsampling.py: each class sets subsampling_rate / right_context)
_SUBSAMPLE_INFO = {
    "linear": (1, 0),
    "linear_legacy": (1, 0),
    "embed": (1, 0),
    "conv1d2": (2, 4),
    "conv2d": (4, 6),
    "conv2d6": (6, 10),
    "conv2d8": (8, 14),
}


def subsample_info(input_layer: str) -> tuple[int, int]:
    """(subsampling_rate, right_context) — reference BaseSubsampling attrs."""
    return _SUBSAMPLE_INFO[input_layer]


# ---------------------------------------------------------------------------
# positional encoding tables (embedding.py)
# ---------------------------------------------------------------------------

def sinusoid_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos table (embedding.py:26 PositionalEncoding)."""
    pe = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def whisper_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """Half-sin/half-cos table (embedding.py:150 WhisperPositionalEncoding)."""
    inc = math.log(10000.0) / (d_model // 2 - 1)
    inv = np.exp(-inc * np.arange(d_model // 2, dtype=np.float32))
    t = np.arange(max_len, dtype=np.float32)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _abs_pos_table(cfg: GenericEncoderConfig) -> np.ndarray:
    if cfg.pos_enc_layer_type == "abs_pos_whisper":
        return whisper_pos_table(cfg.max_len, cfg.output_size)
    return sinusoid_pos_table(cfg.max_len, cfg.output_size)


def _xscale(cfg: GenericEncoderConfig) -> float:
    # whisper / learnable / no_pos use xscale 1 (embedding.py:156,175,178)
    if cfg.pos_enc_layer_type in ("abs_pos_whisper", "embed_learnable_pe", "no_pos"):
        return 1.0
    return math.sqrt(cfg.output_size)


def _is_rel_attn(cfg: GenericEncoderConfig) -> bool:
    return cfg.selfattention_layer_type == "rel_selfattn"


def _pos_for_queries(params, cfg, offset, size: int, dtype) -> jnp.ndarray:
    """Positional rows for query positions [offset, offset+size).

    ``offset`` may be a traced scalar (streaming); the table itself is a
    trace-time constant, so this lowers to one clamped dynamic slice.
    """
    if cfg.pos_enc_layer_type == "no_pos":
        return jnp.zeros((size, cfg.output_size), dtype)
    if cfg.pos_enc_layer_type == "embed_learnable_pe":
        table = params["embed"]["pos_pe"].astype(dtype)
    else:
        table = jnp.asarray(_abs_pos_table(cfg), dtype)
    return jax.lax.dynamic_slice_in_dim(table, offset, size, axis=0)


def _pos_for_keys(params, cfg, start, size: int, dtype) -> jnp.ndarray:
    """Positional rows for key positions [start, start+size); start may be
    negative for partially-filled cache slots (those are masked in the
    attention, so the per-row clamp below only affects dead slots)."""
    if cfg.pos_enc_layer_type == "no_pos":
        return jnp.zeros((size, cfg.output_size), dtype)
    if cfg.pos_enc_layer_type == "embed_learnable_pe":
        table = params["embed"]["pos_pe"].astype(dtype)
    else:
        table = jnp.asarray(_abs_pos_table(cfg), dtype)
    idx = jnp.clip(start + jnp.arange(size), 0, table.shape[0] - 1)
    return jnp.take(table, idx, axis=0)


# ---------------------------------------------------------------------------
# input layers (subsampling.py)
# ---------------------------------------------------------------------------

def init_input_layer(rng, cfg: GenericEncoderConfig) -> dict:
    d, idim = cfg.output_size, cfg.input_size
    ks = jax.random.split(rng, 4)
    kind = cfg.input_layer
    if kind in ("linear", "linear_legacy"):
        p = {"linear": init_dense(ks[0], idim, d), "norm": init_layer_norm(d)}
    elif kind == "embed":
        if cfg.vocab_size <= 0:
            raise ValueError("input_layer='embed' requires vocab_size > 0")
        p = {"embedding": init_embedding(ks[0], cfg.vocab_size, d)}
    elif kind == "conv1d2":
        p = {"conv1": init_conv1d(ks[0], idim, d, 3), "conv2": init_conv1d(ks[1], d, d, 3)}
    elif kind == "conv2d":
        f = ((idim - 1) // 2 - 1) // 2
        p = {
            "conv1": init_conv2d(ks[0], 1, d, 3),
            "conv2": init_conv2d(ks[1], d, d, 3),
            "out": init_dense(ks[2], d * f, d),
        }
    elif kind == "conv2d6":
        f = ((idim - 1) // 2 - 2) // 3
        p = {
            "conv1": init_conv2d(ks[0], 1, d, 3),
            "conv2": init_conv2d(ks[1], d, d, 5),
            "out": init_dense(ks[2], d * f, d),
        }
    elif kind == "conv2d8":
        f = (((idim - 1) // 2 - 1) // 2 - 1) // 2
        p = {
            "conv1": init_conv2d(ks[0], 1, d, 3),
            "conv2": init_conv2d(ks[1], d, d, 3),
            "conv3": init_conv2d(ks[2], d, d, 3),
            "out": init_dense(ks[3], d * f, d),
        }
    else:
        raise ValueError(f"unknown input_layer {kind!r}")
    if cfg.pos_enc_layer_type == "embed_learnable_pe":
        p["pos_pe"] = 0.02 * jax.random.normal(jax.random.fold_in(rng, 7), (cfg.max_len, d))
    return p


def apply_input_layer(params, cfg: GenericEncoderConfig, xs, mask):
    """xs: (B, T, idim) (or (B, T) int for 'embed') -> (x (B,T',D), mask (B,T')).

    Mirrors the exact mask-slicing arithmetic of each reference subsampling
    class so padded lengths match frame-for-frame (subsampling.py:170,227,279,335).
    """
    p = params["embed"]
    kind = cfg.input_layer
    if kind == "linear":
        x = layer_norm(p["norm"], dense(p["linear"], xs), eps=1e-5)
    elif kind == "linear_legacy":
        x = jax.nn.relu(layer_norm(p["norm"], dense(p["linear"], xs), eps=1e-5))
    elif kind == "embed":
        x = embedding(p["embedding"], xs)
    elif kind == "conv1d2":
        h = xs.transpose(0, 2, 1)
        h = jax.nn.gelu(conv1d(p["conv1"], h, padding=1), approximate=False)
        h = jax.nn.gelu(conv1d(p["conv2"], h, stride=2, padding=1), approximate=False)
        x = h.transpose(0, 2, 1)
        t = xs.shape[1]
        mask = mask[:, (t + 1) % 2 :: 2]
    elif kind in ("conv2d", "conv2d6", "conv2d8"):
        h = xs[:, None]  # (B, 1, T, F)
        h = jax.nn.relu(conv2d(p["conv1"], h, stride=2))
        if kind == "conv2d6":
            h = jax.nn.relu(conv2d(p["conv2"], h, stride=3))
        else:
            h = jax.nn.relu(conv2d(p["conv2"], h, stride=2))
        if kind == "conv2d8":
            h = jax.nn.relu(conv2d(p["conv3"], h, stride=2))
        b, c, t, f = h.shape
        x = dense(p["out"], h.transpose(0, 2, 1, 3).reshape(b, t, c * f))
        mask = mask[:, 2::2]
        mask = mask[:, 4::3] if kind == "conv2d6" else mask[:, 2::2]
        if kind == "conv2d8":
            mask = mask[:, 2::2]
    else:
        raise ValueError(kind)
    return x, mask[:, : x.shape[1]]


# ---------------------------------------------------------------------------
# attention (attention.py:26 MultiHeadedAttention / :200 RelPosition...)
# ---------------------------------------------------------------------------

def init_self_attention(rng, cfg: GenericEncoderConfig) -> dict:
    d, h = cfg.output_size, cfg.attention_heads
    ks = jax.random.split(rng, 6)
    p = {
        "linear_q": init_dense(ks[0], d, d),
        "linear_k": init_dense(ks[1], d, d, bias=cfg.key_bias),
        "linear_v": init_dense(ks[2], d, d),
        "linear_out": init_dense(ks[3], d, d),
    }
    if _is_rel_attn(cfg):
        d_k = d // h
        bound = math.sqrt(6.0 / (h + d_k) / 2)
        p["linear_pos"] = init_dense(ks[4], d, d, bias=False)
        p["pos_bias_u"] = jax.random.uniform(ks[5], (h, d_k), jnp.float32, -bound, bound)
        p["pos_bias_v"] = jax.random.uniform(
            jax.random.fold_in(ks[5], 1), (h, d_k), jnp.float32, -bound, bound
        )
    return p


def _attention_core(p, cfg: GenericEncoderConfig, q, k, v, pos_emb, mask):
    """q: (B, Tq, H, dk); k/v: (B, H, Tk, dk); mask: (B, Tq|1, Tk) bool.

    ``pos_emb`` is (P, D): P == 2*Tq-1 triggers the Transformer-XL rel-shift
    (espnet table), P == Tk is the direct per-key lookup (legacy rel_pos /
    streaming); only used by the rel_selfattn variant.
    """
    b, tq, h, d_k = q.shape
    tk = k.shape[2]
    if _is_rel_attn(cfg):
        q_u = (q + p["pos_bias_u"].astype(q.dtype)).transpose(0, 2, 1, 3)
        q_v = (q + p["pos_bias_v"].astype(q.dtype)).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        pe = dense(p["linear_pos"], pos_emb).reshape(-1, h, d_k).transpose(1, 0, 2)
        bd = jnp.einsum("bhqd,hnd->bhqn", q_v, pe)
        if pos_emb.shape[0] != tk:
            bd = rel_shift(bd)  # (B, H, Tq, 2Tq-1) -> (B, H, Tq, Tq)
        scores = scores + bd[..., :tk]
    else:
        qh = q.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, k)
    scores = scores.astype(jnp.float32) / math.sqrt(d_k)
    scores = scores + jnp.where(mask, 0.0, NEG_INF)[:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return dense(p["linear_out"], out.transpose(0, 2, 1, 3).reshape(b, tq, h * d_k))


def self_attention(p, cfg: GenericEncoderConfig, x, pos_emb, mask):
    """Full-utterance self-attention.  x: (B, T, D); mask: (B, T, T)."""
    b, t, d = x.shape
    h = cfg.attention_heads
    d_k = d // h
    q = dense(p["linear_q"], x).reshape(b, t, h, d_k)
    k = dense(p["linear_k"], x).reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    v = dense(p["linear_v"], x).reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    return _attention_core(p, cfg, q, k, v, pos_emb, mask)


# ---------------------------------------------------------------------------
# convolution module (convolution.py:24)
# ---------------------------------------------------------------------------

def init_conv_module(rng, cfg: GenericEncoderConfig) -> dict:
    d = cfg.output_size
    ks = jax.random.split(rng, 3)
    p = {
        "pointwise_conv1": init_conv1d(ks[0], d, 2 * d, 1),
        "depthwise_conv": init_conv1d(ks[1], d, d, cfg.cnn_module_kernel, groups=d),
        "pointwise_conv2": init_conv1d(ks[2], d, d, 1),
    }
    if cfg.cnn_module_norm == "batch_norm":
        p["norm"] = init_batch_norm(d)
    else:
        p["norm"] = init_layer_norm(d)
    return p


def conv_module(p, cfg: GenericEncoderConfig, x, mask_pad, cache: Optional[jnp.ndarray] = None):
    """x: (B, T, D); mask_pad: (B, T) bool valid; cache: (B, D, lorder) for
    causal streaming.  Returns (y (B, T, D), new_cache)."""
    act = _ACTIVATIONS[cfg.activation_type]
    lorder = cfg.cnn_module_kernel - 1 if cfg.causal else 0
    h = (x * mask_pad[..., None].astype(x.dtype)).transpose(0, 2, 1)  # (B, D, T)
    new_cache = None
    if lorder > 0:
        if cache is None:
            cache = jnp.zeros((h.shape[0], h.shape[1], lorder), h.dtype)
        h = jnp.concatenate([cache, h], axis=2)
        new_cache = h[:, :, -lorder:]
        pad = 0
    else:
        pad = (cfg.cnn_module_kernel - 1) // 2
    g = conv1d(p["pointwise_conv1"], h)
    a, b = jnp.split(g, 2, axis=1)
    h = a * jax.nn.sigmoid(b)  # GLU over channels
    h = conv1d(p["depthwise_conv"], h, padding=pad, groups=cfg.output_size)
    if cfg.cnn_module_norm == "batch_norm":
        h = act(batch_norm1d(p["norm"], h))
    else:
        h = act(layer_norm(p["norm"], h.transpose(0, 2, 1), eps=1e-5).transpose(0, 2, 1))
    h = conv1d(p["pointwise_conv2"], h)
    y = h.transpose(0, 2, 1) * mask_pad[..., None].astype(x.dtype)
    return y, new_cache


# ---------------------------------------------------------------------------
# encoder layers (encoder_layer.py:24 Transformer / :109 Conformer)
# ---------------------------------------------------------------------------

def _init_ffn(rng, cfg: GenericEncoderConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "w_1": init_dense(k1, cfg.output_size, cfg.linear_units),
        "w_2": init_dense(k2, cfg.linear_units, cfg.output_size),
    }


def _ffn(p, cfg, x):
    return dense(p["w_2"], _ACTIVATIONS[cfg.activation_type](dense(p["w_1"], x)))


def init_encoder_layer(rng, cfg: GenericEncoderConfig) -> dict:
    ks = jax.random.split(rng, 4)
    d = cfg.output_size
    p = {"self_attn": init_self_attention(ks[0], cfg), "feed_forward": _init_ffn(ks[1], cfg)}
    if cfg.arch == "transformer":
        p["norm1"] = init_layer_norm(d)
        p["norm2"] = init_layer_norm(d)
        return p
    p["norm_mha"] = init_layer_norm(d)
    p["norm_ff"] = init_layer_norm(d)
    if cfg.macaron_style:
        p["feed_forward_macaron"] = _init_ffn(ks[2], cfg)
        p["norm_ff_macaron"] = init_layer_norm(d)
    if cfg.use_cnn_module:
        p["conv_module"] = init_conv_module(ks[3], cfg)
        p["norm_conv"] = init_layer_norm(d)
        p["norm_final"] = init_layer_norm(d)
    return p


def _attend(p, cfg, x, pos_emb, mask, kv_cache):
    """Dispatch full vs streaming attention for one layer."""
    if kv_cache is None:
        return self_attention(p, cfg, x, pos_emb, mask), None
    b, t, d = x.shape
    h = cfg.attention_heads
    d_k = d // h
    q = dense(p["linear_q"], x).reshape(b, t, h, d_k)
    k = dense(p["linear_k"], x).reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    v = dense(p["linear_v"], x).reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    k_full = jnp.concatenate([kv_cache[0], k], axis=2)
    v_full = jnp.concatenate([kv_cache[1], v], axis=2)
    out = _attention_core(p, cfg, q, k_full, v_full, pos_emb, mask)
    # right-aligned window: drop the oldest t entries (static slice)
    new_cache = (k_full[:, :, t:], v_full[:, :, t:])
    return out, new_cache


def encoder_layer(p, cfg: GenericEncoderConfig, x, pos_emb, mask, mask_pad,
                  kv_cache=None, cnn_cache=None):
    """One Transformer/Conformer block; returns (x, new_kv_cache, new_cnn_cache).

    normalize_before=True is pre-LN (reference default); False is post-LN.
    """
    eps = cfg.layer_norm_eps
    pre = cfg.normalize_before

    def sub(norm_key, fn, x):
        res = x
        h = layer_norm(p[norm_key], x, eps) if pre else x
        y = res + fn(h)
        return y if pre else layer_norm(p[norm_key], y, eps)

    if cfg.arch == "transformer":
        new_kv = [None]

        def attn(h):
            out, new_kv[0] = _attend(p["self_attn"], cfg, h, pos_emb, mask, kv_cache)
            return out

        x = sub("norm1", attn, x)
        x = sub("norm2", lambda h: _ffn(p["feed_forward"], cfg, h), x)
        return x, new_kv[0], None

    ff_scale = 0.5 if cfg.macaron_style else 1.0
    if cfg.macaron_style:
        x = sub("norm_ff_macaron", lambda h: ff_scale * _ffn(p["feed_forward_macaron"], cfg, h), x)
    new_kv = [None]

    def attn(h):
        out, new_kv[0] = _attend(p["self_attn"], cfg, h, pos_emb, mask, kv_cache)
        return out

    x = sub("norm_mha", attn, x)
    new_cnn = None
    if cfg.use_cnn_module:
        res = x
        h = layer_norm(p["norm_conv"], x, eps) if pre else x
        y, new_cnn = conv_module(p["conv_module"], cfg, h, mask_pad, cnn_cache)
        x = res + y
        if not pre:
            x = layer_norm(p["norm_conv"], x, eps)
    x = sub("norm_ff", lambda h: ff_scale * _ffn(p["feed_forward"], cfg, h), x)
    if cfg.use_cnn_module:
        x = layer_norm(p["norm_final"], x, eps)
    return x, new_kv[0], new_cnn


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------

def init_generic_encoder(rng, cfg: GenericEncoderConfig) -> dict:
    from cosyvoice2_eu_tpu.registry import validate_encoder_names

    validate_encoder_names(cfg)  # bad yaml-style names fail here, loudly
    ks = jax.random.split(rng, cfg.num_blocks + 1)
    return {
        "embed": init_input_layer(ks[0], cfg),
        "encoders": [init_encoder_layer(ks[1 + i], cfg) for i in range(cfg.num_blocks)],
        "after_norm": init_layer_norm(cfg.output_size),
    }


def _full_pos_emb(params, cfg: GenericEncoderConfig, t: int, dtype) -> jnp.ndarray:
    if not _is_rel_attn(cfg):
        return _pos_for_queries(params, cfg, 0, t, dtype)
    if cfg.pos_enc_layer_type == "rel_pos_espnet":
        return espnet_rel_pos_emb(t, cfg.output_size, dtype)
    # legacy rel_pos: a plain slice of the abs table, one row per key
    return _pos_for_keys(params, cfg, 0, t, dtype)


def generic_encoder_forward(
    params: dict,
    cfg: GenericEncoderConfig,
    xs: jnp.ndarray,
    xs_lens: jnp.ndarray,
    decoding_chunk_size: int = 0,
    num_decoding_left_chunks: int = -1,
):
    """Full-utterance forward (encoder.py:111).

    xs: (B, T, input_size) — or (B, T) int32 for input_layer='embed';
    xs_lens: (B,).  Chunk-mask semantics follow add_optional_chunk_mask
    (utils/mask.py:161): decoding_chunk_size 0 -> static_chunk_size config,
    <0 -> full attention, >0 -> that chunk size with num_decoding_left_chunks.
    Returns (ys (B, T', D), masks (B, T') bool).
    """
    t_in = xs.shape[1]
    valid = make_non_pad_mask(xs_lens, t_in)
    x, valid = apply_input_layer(params, cfg, xs, valid)
    t = x.shape[1]
    sub_lens = jnp.sum(valid.astype(jnp.int32), axis=1)

    x = x * _xscale(cfg)
    if cfg.pos_enc_layer_type in ("abs_pos", "abs_pos_whisper", "embed_learnable_pe"):
        x = x + _pos_for_queries(params, cfg, 0, t, x.dtype)[None]
    pos_emb = _full_pos_emb(params, cfg, t, x.dtype)

    if decoding_chunk_size < 0:
        chunk, n_left = 0, -1
    elif decoding_chunk_size > 0:
        chunk, n_left = decoding_chunk_size, num_decoding_left_chunks
    else:
        chunk, n_left = cfg.static_chunk_size, -1
    mask = chunk_attention_mask(sub_lens, t, chunk, n_left)

    for lp in params["encoders"]:
        x, _, _ = encoder_layer(lp, cfg, x, pos_emb, mask, valid)
    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x, eps=1e-5)  # encoder.py:102
    return x, valid


# ---------------------------------------------------------------------------
# streaming (encoder.py:183 forward_chunk — static-shape KV window)
# ---------------------------------------------------------------------------

def init_chunk_state(cfg: GenericEncoderConfig, cache_t: int, batch: int = 1,
                     dtype=jnp.float32) -> dict:
    """Fixed-width right-aligned streaming cache.

    cache_t = decoding_chunk_size * num_decoding_left_chunks (the reference's
    required_cache_size, encoder.py:200).  ``filled`` counts valid right-most
    slots; ``offset`` counts encoder-output frames already emitted.
    """
    if cfg.pos_enc_layer_type == "rel_pos_espnet":
        # The reference's own forward_chunk produces mismatched matrix_ac /
        # matrix_bd shapes for this table once offset > 0 (attention.py:324
        # only rel-shifts on shape mismatch); streaming configs use
        # abs/legacy-rel positions.  Mirror that contract loudly.
        raise ValueError("chunk streaming is not defined for rel_pos_espnet "
                         "(matches the reference encoder's own constraint)")
    d_k = cfg.output_size // cfg.attention_heads
    lorder = cfg.cnn_module_kernel - 1 if (cfg.arch == "conformer" and cfg.use_cnn_module and cfg.causal) else 0
    return {
        "att_k": jnp.zeros((cfg.num_blocks, batch, cfg.attention_heads, cache_t, d_k), dtype),
        "att_v": jnp.zeros((cfg.num_blocks, batch, cfg.attention_heads, cache_t, d_k), dtype),
        "cnn": jnp.zeros((cfg.num_blocks, batch, cfg.output_size, lorder), dtype),
        "offset": jnp.zeros((), jnp.int32),
        "filled": jnp.zeros((), jnp.int32),
    }


def generic_encoder_forward_chunk(params: dict, cfg: GenericEncoderConfig,
                                  state: dict, xs: jnp.ndarray):
    """One streaming chunk (encoder.py:183).  jit-stable: same shapes every call.

    xs: (B, time, input_size) where time = (chunk_size-1)*subsample_rate +
    right_context + 1 (reference decoding_window).  Returns (ys, new_state).
    """
    b = xs.shape[0]
    ones = jnp.ones((b, xs.shape[1]), bool)
    x, _ = apply_input_layer(params, cfg, xs, ones)
    t = x.shape[1]
    cache_t = state["att_k"].shape[3]
    offset, filled = state["offset"], state["filled"]

    x = x * _xscale(cfg)
    if cfg.pos_enc_layer_type in ("abs_pos", "abs_pos_whisper", "embed_learnable_pe"):
        x = x + _pos_for_queries(params, cfg, offset, t, x.dtype)[None]
    # keys span absolute positions [offset - cache_t, offset + t); slots left
    # of the fill point are masked (and pe-clamped) — they never contribute
    pos_emb = (_pos_for_keys(params, cfg, offset - cache_t, cache_t + t, x.dtype)
               if _is_rel_attn(cfg) else
               _pos_for_queries(params, cfg, 0, t, x.dtype))
    slot = jnp.arange(cache_t + t)
    key_valid = slot >= (cache_t - filled)
    mask = jnp.broadcast_to(key_valid[None, None, :], (b, t, cache_t + t))
    mask_pad = jnp.ones((b, t), bool)

    new_k, new_v, new_cnn = [], [], []
    for i, lp in enumerate(params["encoders"]):
        kv = (state["att_k"][i], state["att_v"][i])
        cnn = state["cnn"][i] if state["cnn"].shape[-1] > 0 else None
        x, kv_out, cnn_out = encoder_layer(lp, cfg, x, pos_emb, mask, mask_pad, kv, cnn)
        new_k.append(kv_out[0])
        new_v.append(kv_out[1])
        new_cnn.append(cnn_out if cnn_out is not None else state["cnn"][i])
    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x, eps=1e-5)  # encoder.py:102

    new_state = {
        "att_k": jnp.stack(new_k),
        "att_v": jnp.stack(new_v),
        "cnn": jnp.stack(new_cnn),
        "offset": offset + t,
        "filled": jnp.minimum(filled + t, cache_t),
    }
    return x, new_state


def generic_encoder_forward_chunk_by_chunk(
    params: dict,
    cfg: GenericEncoderConfig,
    xs: jnp.ndarray,
    decoding_chunk_size: int,
    num_decoding_left_chunks: int = -1,
):
    """Host-side streaming driver (encoder.py:274 forward_chunk_by_chunk).

    Feeds overlapping windows chunk by chunk; every step reuses one compiled
    program (static window size + fixed cache).  Returns (ys, masks).
    """
    assert decoding_chunk_size > 0
    subsampling, right_context = subsample_info(cfg.input_layer)
    context = right_context + 1
    stride = subsampling * decoding_chunk_size
    window = (decoding_chunk_size - 1) * subsampling + context
    num_frames = xs.shape[1]
    n_chunks = max(len(range(0, num_frames - context + 1, stride)), 1)
    # -1 = unlimited left context (encoder.py:274): size the fixed cache to
    # hold EVERY previous chunk of this utterance, which reproduces the
    # reference's dynamically-growing cache exactly (the cache width — and
    # hence the compiled program — then depends on utterance length; bounded
    # contexts keep one program across utterances)
    n_left = num_decoding_left_chunks if num_decoding_left_chunks >= 0 else n_chunks
    state = init_chunk_state(cfg, decoding_chunk_size * n_left, xs.shape[0], xs.dtype)

    step = jax.jit(lambda s, c: generic_encoder_forward_chunk(params, cfg, s, c))
    outputs = []
    for cur in range(0, num_frames - context + 1, stride):
        # steady-state windows all share one compiled program; a shorter tail
        # window compiles once more (padding it instead would leak pad frames
        # into the attention keys of the final chunk)
        chunk = xs[:, cur:cur + window]
        y, state = step(state, chunk)
        outputs.append(y)
    ys = jnp.concatenate(outputs, axis=1)
    return ys, jnp.ones((ys.shape[0], ys.shape[1]), bool)


# ---------------------------------------------------------------------------
# reference state-dict conversion
# ---------------------------------------------------------------------------

def convert_generic_encoder(state: dict, cfg: GenericEncoderConfig) -> dict:
    """Map a reference TransformerEncoder/ConformerEncoder ``state_dict()``
    (numpy arrays) into this module's pytree, key-for-key."""
    j = {k: jnp.asarray(v) for k, v in state.items()}

    def lin(prefix, bias=True):
        p = {"weight": j[f"{prefix}.weight"]}
        if bias and f"{prefix}.bias" in j:
            p["bias"] = j[f"{prefix}.bias"]
        return p

    def norm(prefix):
        return {"weight": j[f"{prefix}.weight"], "bias": j[f"{prefix}.bias"]}

    kind = cfg.input_layer
    if kind in ("linear", "linear_legacy"):
        embed = {"linear": lin("embed.out.0"), "norm": norm("embed.out.1")}
    elif kind == "embed":
        embed = {"embedding": {"weight": j["embed.embed.weight"]}}
    elif kind == "conv1d2":
        embed = {"conv1": lin("embed.conv.0"), "conv2": lin("embed.conv.2")}
    elif kind == "conv2d":
        embed = {"conv1": lin("embed.conv.0"), "conv2": lin("embed.conv.2"),
                 "out": lin("embed.out.0")}
    elif kind in ("conv2d6", "conv2d8"):
        embed = {"conv1": lin("embed.conv.0"), "conv2": lin("embed.conv.2"),
                 "out": lin("embed.linear")}
        if kind == "conv2d8":
            embed["conv3"] = lin("embed.conv.4")
    else:
        raise ValueError(kind)
    if cfg.pos_enc_layer_type == "embed_learnable_pe":
        embed["pos_pe"] = j["embed.pos_enc.pe"][0]

    layers = []
    for i in range(cfg.num_blocks):
        pre = f"encoders.{i}"
        attn = {
            "linear_q": lin(f"{pre}.self_attn.linear_q"),
            "linear_k": lin(f"{pre}.self_attn.linear_k"),
            "linear_v": lin(f"{pre}.self_attn.linear_v"),
            "linear_out": lin(f"{pre}.self_attn.linear_out"),
        }
        if _is_rel_attn(cfg):
            attn["linear_pos"] = lin(f"{pre}.self_attn.linear_pos", bias=False)
            attn["pos_bias_u"] = j[f"{pre}.self_attn.pos_bias_u"]
            attn["pos_bias_v"] = j[f"{pre}.self_attn.pos_bias_v"]
        lp = {
            "self_attn": attn,
            "feed_forward": {"w_1": lin(f"{pre}.feed_forward.w_1"),
                             "w_2": lin(f"{pre}.feed_forward.w_2")},
        }
        if cfg.arch == "transformer":
            lp["norm1"] = norm(f"{pre}.norm1")
            lp["norm2"] = norm(f"{pre}.norm2")
        else:
            lp["norm_mha"] = norm(f"{pre}.norm_mha")
            lp["norm_ff"] = norm(f"{pre}.norm_ff")
            if cfg.macaron_style:
                lp["feed_forward_macaron"] = {
                    "w_1": lin(f"{pre}.feed_forward_macaron.w_1"),
                    "w_2": lin(f"{pre}.feed_forward_macaron.w_2"),
                }
                lp["norm_ff_macaron"] = norm(f"{pre}.norm_ff_macaron")
            if cfg.use_cnn_module:
                cm = {
                    "pointwise_conv1": lin(f"{pre}.conv_module.pointwise_conv1"),
                    "depthwise_conv": lin(f"{pre}.conv_module.depthwise_conv"),
                    "pointwise_conv2": lin(f"{pre}.conv_module.pointwise_conv2"),
                    "norm": norm(f"{pre}.conv_module.norm"),
                }
                if cfg.cnn_module_norm == "batch_norm":
                    cm["norm"]["running_mean"] = j[f"{pre}.conv_module.norm.running_mean"]
                    cm["norm"]["running_var"] = j[f"{pre}.conv_module.norm.running_var"]
                lp["conv_module"] = cm
                lp["norm_conv"] = norm(f"{pre}.norm_conv")
                lp["norm_final"] = norm(f"{pre}.norm_final")
        layers.append(lp)

    return {"embed": embed, "encoders": layers, "after_norm": norm("after_norm")}
