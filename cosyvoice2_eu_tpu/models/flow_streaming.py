"""Chunk-cached streaming flow: O(T) per chunk instead of O(T^2) recompute.

The reference recomputes the FULL prompt+history through the conformer
encoder and all 10 CFG Euler steps for every 25-token streaming chunk
(reference: cosy_repo/cosyvoice/cli/model.py:300 token2wav -> flow.py:235
inference; SURVEY §7 hard-part #3).  Because streaming mode uses chunked
causal attention (chunk 25 tokens / 50 mel, full left context) and causal
convolutions, every already-computed position is a pure function of its past
— so per-layer KV caches plus small causal-conv tail caches reproduce the
recomputation EXACTLY (verified by equality tests) at constant per-chunk cost.

Cache inventory per session:
  * conformer pre/up stacks: per layer K/V at token/mel rate + rel-pos tables
  * pre-lookahead conv2 tail (2 frames), upsample conv tail (4 mel frames)
  * estimator: per (Euler step, stage): the post-LN attention inputs (K/V
    re-projected per chunk — bit-identical, 4x less HBM) and (k-1)-frame
    input tails for every causal conv
The final (finalize=True) chunk intentionally stays a full recompute with
non-chunked attention, matching the reference's semantics (cli/model.py:374
passes stream=False on the last call).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import FlowConfig
from cosyvoice2_eu_tpu.models.encoder import espnet_rel_pos_emb
from cosyvoice2_eu_tpu.models.estimator import _mish, sinusoidal_time_emb
from cosyvoice2_eu_tpu.ops.masks import NEG_INF
from cosyvoice2_eu_tpu.utils.params import dense, embedding, layer_norm

# ---------------------------------------------------------------------------
# cached primitives
# ---------------------------------------------------------------------------


def causal_conv_cached(p, x_new, tail, dilation: int = 1):
    """Causal conv over a chunk given the (k-1)*dilation-frame input tail.

    x_new: (B, C, n); tail: (B, C, (k-1)*d) previous input frames.
    Returns (y (B, C_out, n), new_tail).
    """
    k = p["weight"].shape[-1]
    ctx = (k - 1) * dilation
    full = jnp.concatenate([tail, x_new], axis=2)
    from cosyvoice2_eu_tpu.utils.params import conv1d

    y = conv1d(p, full, dilation=dilation)
    new_tail = full[:, :, full.shape[2] - ctx :] if ctx else tail
    return y, new_tail


def attn_cached(q, k_new, v_new, k_cache, v_cache, t0, mask_new, scale):
    """Generic cached attention.

    q/k_new/v_new: (B, H, n, D); caches: (B, H, T_max, D); t0: scalar write
    offset; mask_new: (B, n, T_max) visibility of every cache slot (True =
    attend).  Returns (out (B, H, n, D), k_cache, v_cache).
    """
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), (0, 0, t0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), (0, 0, t0, 0))
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k_cache.astype(q.dtype)) * scale
    scores = scores.astype(jnp.float32) + jnp.where(mask_new, 0.0, NEG_INF)[:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v_cache.astype(q.dtype))
    return out, k_cache, v_cache


def _chunk_mask(t0, n, t_max, chunk: int):
    """(n, t_max) visibility: key j visible to query t0+i iff j <= end of the
    query's chunk and j < t0 + i + ... (chunked semantics: j // chunk <=
    (t0+i) // chunk) and j < t0 + n (nothing beyond what exists)."""
    q_abs = t0 + jnp.arange(n)[:, None]
    j = jnp.arange(t_max)[None, :]
    vis = (j // chunk) <= (q_abs // chunk)
    vis &= j < (t0 + n)
    return vis


# ---------------------------------------------------------------------------
# conformer (cached)
# ---------------------------------------------------------------------------


class ConformerCache(NamedTuple):
    k: jnp.ndarray  # (layers, B, H, T_max, dk)
    v: jnp.ndarray
    t0: jnp.ndarray  # scalar int32 — frames already cached


def _rel_bd_cached(q_v, p_table, t0, t_max):
    """bd[i, j] = q_v[i] . P[(L-1) - (abs_i - j)] computed via a full-offset
    einsum then gather (exact match of rel_shift semantics)."""
    b, h, n, dk = q_v.shape
    L = t_max
    # (B, H, n, 2L-1)
    bd_all = jnp.einsum("bhnd,mhd->bhnm", q_v, p_table)
    abs_i = t0 + jnp.arange(n)[:, None]
    j = jnp.arange(t_max)[None, :]
    idx = (L - 1) - (abs_i - j)  # (n, t_max) in [0, 2L-2]
    idx = jnp.clip(idx, 0, 2 * L - 2)
    return jnp.take_along_axis(
        bd_all, jnp.broadcast_to(idx[None, None], (b, h, n, t_max)), axis=-1
    )


def conformer_layer_cached(lp, heads, x_new, p_table, cache_k, cache_v, t0, mask, eps=1e-12):
    b, n, dim = x_new.shape
    dk = dim // heads
    h = layer_norm(lp["norm_mha"], x_new, eps)
    q = dense(lp["self_attn"]["linear_q"], h).reshape(b, n, heads, dk)
    k = dense(lp["self_attn"]["linear_k"], h).reshape(b, n, heads, dk).transpose(0, 2, 1, 3)
    v = dense(lp["self_attn"]["linear_v"], h).reshape(b, n, heads, dk).transpose(0, 2, 1, 3)

    q_u = (q + lp["self_attn"]["pos_bias_u"].astype(x_new.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + lp["self_attn"]["pos_bias_v"].astype(x_new.dtype)).transpose(0, 2, 1, 3)

    cache_k = jax.lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, 0, t0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, 0, t0, 0))
    ac = jnp.einsum("bhnd,bhmd->bhnm", q_u, cache_k.astype(q_u.dtype))
    bd = _rel_bd_cached(q_v, p_table, t0, cache_k.shape[2])
    scores = (ac + bd) / math.sqrt(dk)
    scores = scores.astype(jnp.float32) + jnp.where(mask, 0.0, NEG_INF)[:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(x_new.dtype)
    att = jnp.einsum("bhnm,bhmd->bhnd", probs, cache_v.astype(x_new.dtype))
    att = att.transpose(0, 2, 1, 3).reshape(b, n, dim)
    x = x_new + dense(lp["self_attn"]["linear_out"], att)
    h = layer_norm(lp["norm_ff"], x, eps)
    x = x + dense(lp["ffn_w2"], jax.nn.silu(dense(lp["ffn_w1"], h)))
    return x, cache_k, cache_v


# ---------------------------------------------------------------------------
# full streaming flow state
# ---------------------------------------------------------------------------


class FlowStreamState(NamedTuple):
    # conformer token-rate stack
    pre_k: jnp.ndarray  # (L1, B, H, T_tok, dk)
    pre_v: jnp.ndarray
    lookahead_tail: jnp.ndarray  # (B, D, 2) conv2 input tail
    up_conv_tail: jnp.ndarray  # (B, D, stride*2) upsample conv input tail
    # conformer mel-rate stack
    up_k: jnp.ndarray  # (L2, B, H, T_mel, dk)
    up_v: jnp.ndarray
    # estimator attention cache: the POST-LayerNorm attention inputs
    # (steps, stages, 2B, T_mel, ch).  K/V are re-projected from this each
    # chunk — bit-identical (the projections are linear, no bias) and 4x
    # smaller in HBM than caching K++V (ch=256 vs heads*dh*2=1024), which
    # bounds a 768-token session under 300 MB (VERDICT r1 weak #8).
    est_h: jnp.ndarray
    conv_tails: dict  # name -> (steps, 2B, C, k-1)
    t_tok: jnp.ndarray  # scalar: tokens cached so far
    t_mel: jnp.ndarray


def init_flow_stream_state(cfg: FlowConfig, t_tok_max: int, dtype=jnp.bfloat16, batch: int = 1) -> FlowStreamState:
    enc = cfg.encoder
    est = cfg.estimator
    t_mel_max = t_tok_max * enc.upsample_stride
    h1 = enc.attention_heads
    dk = enc.output_size // h1
    steps = cfg.cfm.n_timesteps
    stages = 2 + est.num_mid_blocks
    ch = est.channels[0]
    b2 = 2 * batch  # CFG double batch
    dh = est.attention_head_dim

    conv_tails = {
        # 31 causal-conv sites; tails keyed by site name
        "down_b1": jnp.zeros((steps, b2, est.in_channels, 2), dtype),
        "down_b2": jnp.zeros((steps, b2, ch, 2), dtype),
        "down_conv": jnp.zeros((steps, b2, ch, 2), dtype),
        "mid_b1": jnp.zeros((est.num_mid_blocks, steps, b2, ch, 2), dtype),
        "mid_b2": jnp.zeros((est.num_mid_blocks, steps, b2, ch, 2), dtype),
        "up_b1": jnp.zeros((steps, b2, ch * 2, 2), dtype),
        "up_b2": jnp.zeros((steps, b2, ch, 2), dtype),
        "up_conv": jnp.zeros((steps, b2, ch, 2), dtype),
        "final_b": jnp.zeros((steps, b2, ch, 2), dtype),
    }
    return FlowStreamState(
        pre_k=jnp.zeros((enc.num_blocks, batch, h1, t_tok_max, dk), dtype),
        pre_v=jnp.zeros((enc.num_blocks, batch, h1, t_tok_max, dk), dtype),
        lookahead_tail=jnp.zeros((batch, enc.output_size, 2), dtype),
        up_conv_tail=jnp.zeros((batch, enc.output_size, enc.upsample_stride * 2), dtype),
        up_k=jnp.zeros((enc.num_up_blocks, batch, h1, t_mel_max, dk), dtype),
        up_v=jnp.zeros((enc.num_up_blocks, batch, h1, t_mel_max, dk), dtype),
        est_h=jnp.zeros((steps, stages, b2, t_mel_max, ch), dtype),
        conv_tails=conv_tails,
        t_tok=jnp.zeros((), jnp.int32),
        t_mel=jnp.zeros((), jnp.int32),
    )


def _encoder_chunk(params, cfg: FlowConfig, state: FlowStreamState, h_tok_new, context):
    """Run n new tokens (+3-token lookahead context) through the cached
    conformer; returns (mel-rate features (B, 2n, 80-proj-input), state)."""
    from cosyvoice2_eu_tpu.models.encoder import _embed
    from cosyvoice2_eu_tpu.utils.params import conv1d

    enc = cfg.encoder
    d = enc.output_size
    b, n, _ = h_tok_new.shape
    t_tok_max = state.pre_k.shape[3]
    t_mel_max = state.up_k.shape[3]
    stride = enc.upsample_stride
    t0 = state.t_tok

    x = _embed(params["encoder"]["embed"], h_tok_new, d)
    ctx = _embed(params["encoder"]["embed"], context, d)

    # pre-lookahead: conv1 (k=la+1, needs 3 future) + causal conv2 (k=3)
    la = enc.pre_lookahead_len
    pl = params["encoder"]["pre_lookahead"]
    h = jnp.concatenate([x, ctx], axis=1).transpose(0, 2, 1)  # (B, D, n+3)
    h = jax.nn.leaky_relu(conv1d(pl["conv1"], h), 0.01)  # (B, D, n)
    h2, la_tail = causal_conv_cached(pl["conv2"], h, state.lookahead_tail)
    x = h2.transpose(0, 2, 1) + x

    # token-rate conformer stack
    p_table_tok = params["_ptab_pre"]  # list per layer (2L-1, H, dk)
    mask_tok = _chunk_mask(t0, n, t_tok_max, enc.static_chunk_size)[None]
    pre_k, pre_v = state.pre_k, state.pre_v
    for i, lp in enumerate(params["encoder"]["encoders"]):
        x, ck, cv = conformer_layer_cached(
            lp, enc.attention_heads, x, p_table_tok[i], pre_k[i], pre_v[i], t0, mask_tok
        )
        pre_k, pre_v = pre_k.at[i].set(ck), pre_v.at[i].set(cv)

    # upsample: nearest x2 + causal conv (k = 2*stride+1, left pad 2*stride)
    h = x.transpose(0, 2, 1)
    h = jnp.repeat(h, stride, axis=2)  # (B, D, 2n)
    full = jnp.concatenate([state.up_conv_tail, h], axis=2)
    h_up = conv1d(params["encoder"]["up_layer"], full)  # (B, D, 2n)
    new_up_tail = full[:, :, full.shape[2] - stride * 2 :]
    xu = h_up.transpose(0, 2, 1)

    m0 = t0 * stride
    nm = n * stride
    xu = _embed(params["encoder"]["up_embed"], xu, d)
    mask_mel = _chunk_mask(m0, nm, t_mel_max, enc.static_chunk_size * stride)[None]
    p_table_mel = params["_ptab_up"]
    up_k, up_v = state.up_k, state.up_v
    for i, lp in enumerate(params["encoder"]["up_encoders"]):
        xu, ck, cv = conformer_layer_cached(
            lp, enc.attention_heads, xu, p_table_mel[i], up_k[i], up_v[i], m0, mask_mel
        )
        up_k, up_v = up_k.at[i].set(ck), up_v.at[i].set(cv)
    xu = layer_norm(params["encoder"]["after_norm"], xu, eps=1e-5)

    state = state._replace(
        pre_k=pre_k, pre_v=pre_v, lookahead_tail=la_tail, up_conv_tail=new_up_tail,
        up_k=up_k, up_v=up_v, t_tok=t0 + n, t_mel=m0 + nm,
    )
    return xu, state


def _estimator_chunk(params, cfg: FlowConfig, state: FlowStreamState, x_new, mu_new, spks, cond_new):
    """Run all Euler steps over the new mel chunk with per-step caches.

    x_new (B, 80, n) is the fixed-noise slice for these positions; the Euler
    integration happens per-position (each position evolves independently
    given the estimator outputs, which see cached history).
    """
    est = cfg.estimator
    from cosyvoice2_eu_tpu.models.flow import cosine_t_span
    from cosyvoice2_eu_tpu.utils.params import conv1d

    b, _, n = x_new.shape
    t_mel_max = state.est_h.shape[3]
    m0 = state.t_mel - n  # encoder already advanced t_mel by n
    rate = cfg.cfm.inference_cfg_rate
    t_span = cosine_t_span(cfg.cfm.n_timesteps)
    mask_mel = _chunk_mask(m0, n, t_mel_max, est.static_chunk_size)
    mask2 = jnp.broadcast_to(mask_mel[None], (2 * b, n, t_mel_max))

    mu_in = jnp.concatenate([mu_new, jnp.zeros_like(mu_new)], axis=0)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond_new, jnp.zeros_like(cond_new)], axis=0)

    est_h = state.est_h
    tails = dict(state.conv_tails)
    x = x_new

    def tf_block_cached(tp, ht, step, stage_idx, eh):
        b2, nn, c = ht.shape
        heads = est.num_heads
        dh = est.attention_head_dim
        h = layer_norm(tp["norm1"], ht)
        # cache the LN'd attention inputs; re-project the whole prefix to K/V
        # (linear, bias-free => zeros stay zeros and history is bit-identical
        # to caching K/V directly, at a quarter of the HBM)
        h_cache = jax.lax.dynamic_update_slice(
            eh[step, stage_idx], h.astype(eh.dtype), (0, m0, 0)
        )
        eh = eh.at[step, stage_idx].set(h_cache)
        q = dense(tp["to_q"], h).reshape(b2, nn, heads, dh).transpose(0, 2, 1, 3)
        hist = h_cache.astype(h.dtype)
        k = dense(tp["to_k"], hist).reshape(b2, t_mel_max, heads, dh).transpose(0, 2, 1, 3)
        v = dense(tp["to_v"], hist).reshape(b2, t_mel_max, heads, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(dh)
        scores = scores.astype(jnp.float32) + jnp.where(mask2, 0.0, NEG_INF)[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b2, nn, heads * dh)
        ht = ht + dense(tp["to_out"], out)
        h = layer_norm(tp["norm3"], ht)
        ht = ht + dense(tp["ff_out"], jax.nn.gelu(dense(tp["ff_in"], h), approximate=False))
        return ht, eh

    def resnet_cached(rp, h, temb, tail_b1, tail_b2):
        h_in = h
        y, tail_b1 = causal_conv_cached(rp["block1"]["conv"], h, tail_b1)
        y = layer_norm(rp["block1"]["norm"], y.transpose(0, 2, 1)).transpose(0, 2, 1)
        y = _mish(y)
        y = y + dense(rp["mlp"], _mish(temb))[:, :, None]
        y, tail_b2 = causal_conv_cached(rp["block2"]["conv"], y, tail_b2)
        y = layer_norm(rp["block2"]["norm"], y.transpose(0, 2, 1)).transpose(0, 2, 1)
        y = _mish(y)
        return y + conv1d(rp["res_conv"], h_in), tail_b1, tail_b2

    ep = params["estimator"]

    # lax.scan over Euler steps: one traced body instead of n_timesteps
    # inlined U-Net copies (~10x smaller executable, same math — the steps
    # differ only in (s, t_cur, dt), threaded through as scan inputs; the
    # per-step caches index on the traced s)
    def euler_step(carry, sx):
        x, est_h, tails = carry
        s, t_cur, dt = sx
        temb = sinusoidal_time_emb(
            jnp.full((2 * b,), t_cur, jnp.float32), est.in_channels, est.time_embed_scale
        ).astype(x.dtype)
        temb = dense(ep["time_mlp"]["linear_1"], temb)
        temb = dense(ep["time_mlp"]["linear_2"], jax.nn.silu(temb))

        h = jnp.concatenate(
            [jnp.concatenate([x, x], axis=0), mu_in,
             jnp.broadcast_to(spks_in[:, :, None], (2 * b, spks.shape[1], n)), cond_in],
            axis=1,
        )
        # down stage (stage 0)
        h, t1, t2 = resnet_cached(
            ep["down"]["resnet"], h, temb, tails["down_b1"][s], tails["down_b2"][s]
        )
        tails["down_b1"] = tails["down_b1"].at[s].set(t1)
        tails["down_b2"] = tails["down_b2"].at[s].set(t2)
        ht = h.transpose(0, 2, 1)
        for tp in ep["down"]["transformer"]:
            ht, est_h = tf_block_cached(tp, ht, s, 0, est_h)
        h = ht.transpose(0, 2, 1)
        skip = h
        h, tc = causal_conv_cached(ep["down"]["conv"], h, tails["down_conv"][s])
        tails["down_conv"] = tails["down_conv"].at[s].set(tc)
        # mid stages (1..num_mid)
        for mi, sp in enumerate(ep["mid"]):
            h, t1, t2 = resnet_cached(
                sp["resnet"], h, temb, tails["mid_b1"][mi, s], tails["mid_b2"][mi, s]
            )
            tails["mid_b1"] = tails["mid_b1"].at[mi, s].set(t1)
            tails["mid_b2"] = tails["mid_b2"].at[mi, s].set(t2)
            ht = h.transpose(0, 2, 1)
            for tp in sp["transformer"]:
                ht, est_h = tf_block_cached(tp, ht, s, 1 + mi, est_h)
            h = ht.transpose(0, 2, 1)
        # up stage (last)
        h = jnp.concatenate([h, skip], axis=1)
        h, t1, t2 = resnet_cached(
            ep["up"]["resnet"], h, temb, tails["up_b1"][s], tails["up_b2"][s]
        )
        tails["up_b1"] = tails["up_b1"].at[s].set(t1)
        tails["up_b2"] = tails["up_b2"].at[s].set(t2)
        ht = h.transpose(0, 2, 1)
        for tp in ep["up"]["transformer"]:
            ht, est_h = tf_block_cached(tp, ht, s, 1 + est.num_mid_blocks, est_h)
        h = ht.transpose(0, 2, 1)
        h, tc = causal_conv_cached(ep["up"]["conv"], h, tails["up_conv"][s])
        tails["up_conv"] = tails["up_conv"].at[s].set(tc)
        # final
        h, tf_ = causal_conv_cached(ep["final_block"]["conv"], h, tails["final_b"][s])
        tails["final_b"] = tails["final_b"].at[s].set(tf_)
        h = layer_norm(ep["final_block"]["norm"], h.transpose(0, 2, 1)).transpose(0, 2, 1)
        h = _mish(h)
        dphi = conv1d(ep["final_proj"], h)
        dphi_c, dphi_u = dphi[:b], dphi[b:]
        vfield = (1.0 + rate) * dphi_c - rate * dphi_u
        x = (x + dt.astype(x.dtype) * vfield).astype(x_new.dtype)
        return (x, est_h, tails), None

    n_steps = len(t_span) - 1
    (x, est_h, tails), _ = jax.lax.scan(
        euler_step,
        (x, est_h, tails),
        (
            jnp.arange(n_steps, dtype=jnp.int32),
            jnp.asarray(t_span[:n_steps], jnp.float32),
            jnp.asarray(t_span[1:] - t_span[:n_steps], jnp.float32),
        ),
    )
    state = state._replace(est_h=est_h, conv_tails=tails)
    return x, state


def prepare_stream_params(params: dict, cfg: FlowConfig, t_tok_max: int) -> dict:
    """Precompute per-layer rel-pos projection tables for cached attention.

    ONE aot_jit'd device program (persisted in the executable store):
    building these eagerly cost one remote XLA compile per op under a fresh
    compile cache, and a host-numpy build paid tunnel fetches of every
    linear_pos weight — both were multi-tens-of-seconds cold-start taxes
    (VERDICT r4 next #2) for what is a single batched matmul."""
    from cosyvoice2_eu_tpu.runtime.aot_cache import aot_jit

    enc = cfg.encoder
    d = enc.output_size
    heads = enc.attention_heads
    dk = d // heads
    dtype = params["input_embedding"]["weight"].dtype

    def tables_program(enc_params):
        def tables(layers, L):
            pe = espnet_rel_pos_emb(L, d, dtype)  # np constant in the trace
            return [
                dense(lp["self_attn"]["linear_pos"], jnp.asarray(pe))
                .reshape(-1, heads, dk)
                for lp in layers
            ]

        return (
            tables(enc_params["encoders"], t_tok_max),
            tables(enc_params["up_encoders"], t_tok_max * enc.upsample_stride),
        )

    fn = aot_jit(
        f"stream_ptab_t{t_tok_max}_{jnp.dtype(dtype).name}", tables_program
    )
    pre, up = fn(params["encoder"])
    p = dict(params)
    p["_ptab_pre"] = list(pre)
    p["_ptab_up"] = list(up)
    return p


def flow_chunk(
    params: dict,
    cfg: FlowConfig,
    state: FlowStreamState,
    token_new: jnp.ndarray,
    context_tokens: jnp.ndarray,
    embedding_vec: jnp.ndarray,
    prompt_feat_chunk: jnp.ndarray,
):
    """Synthesize mel for n new tokens (with 3-token lookahead context).

    token_new: (B, n) the next hop of speech tokens; context_tokens: (B, 3);
    prompt_feat_chunk: (B, 2n, 80) prompt mel covering these positions (zeros
    past the prompt).  Returns (mel (B, 80, 2n), state).

    params must come from prepare_stream_params.
    """
    dtype = params["input_embedding"]["weight"].dtype
    spk = embedding_vec / jnp.maximum(jnp.linalg.norm(embedding_vec, axis=1, keepdims=True), 1e-12)
    spk = dense(params["spk_embed_affine_layer"], spk.astype(dtype))

    h_tok = embedding(params["input_embedding"], jnp.maximum(token_new, 0)).astype(dtype)
    h_ctx = embedding(params["input_embedding"], jnp.maximum(context_tokens, 0)).astype(dtype)

    h_mel, state = _encoder_chunk(params, cfg, state, h_tok, h_ctx)
    mu = dense(params["encoder_proj"], h_mel).transpose(0, 2, 1)  # (B, 80, 2n)

    n_mel = mu.shape[2]
    m0 = state.t_mel - n_mel
    noise = jax.lax.dynamic_slice(
        params["rand_noise"], (0, 0, m0), (1, cfg.output_size, n_mel)
    ).astype(dtype)
    z = jnp.broadcast_to(noise, mu.shape)
    cond = prompt_feat_chunk.transpose(0, 2, 1).astype(dtype)

    mel, state = _estimator_chunk(params, cfg, state, z, mu, spk, cond)
    return mel.astype(jnp.float32), state
