"""v1 speech LM: TransformerLM — conformer text encoder + rel-pos decoder.

Reference: cosy_repo/cosyvoice/llm/llm.py:120 (TransformerLM).  The v1
family's LM is NOT an HF backbone: a causal ConformerEncoder encodes text
(chunk size 1 == causal, llm.py:169), and a 14-block TransformerEncoder with
espnet relative positions serves as the decoder-only speech-token LM, driven
token-by-token through forward_chunk with an unbounded KV cache
(llm.py:300-333).

TPU-native design: decode runs as a lax.while_loop over a STATIC KV cache
(slots [0, P_bucket) hold the packed prefix, [P_bucket, P_bucket+max_gen)
the generated tokens — the same layout as the v2 LM, models/llm.py:108).
The espnet rel-pos bias for a decode step is computed as
(q + pos_bias_v) @ (W_pos pe) gathered at relative distance (pos_q - pos_k):
one small matmul against a precomputed per-layer position table plus a 1-D
gather, instead of the reference's per-step table slice + rel-shift —
numerically identical for causal queries (attention.py:225,321).

Param pytrees reuse the generic-encoder layout (models/generic_encoder.py),
so convert_generic_encoder maps reference checkpoints key-for-key.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import GenericEncoderConfig, LMV1Config
from cosyvoice2_eu_tpu.models.generic_encoder import (
    _attention_core,
    _ffn,
    apply_input_layer,
    _full_pos_emb,
    generic_encoder_forward,
    init_generic_encoder,
)
from cosyvoice2_eu_tpu.ops.masks import NEG_INF, chunk_attention_mask
from cosyvoice2_eu_tpu.ops.sampling import ras_sample
from cosyvoice2_eu_tpu.utils.params import (
    dense,
    embedding,
    init_dense,
    init_embedding,
    layer_norm,
)

IGNORE_ID = -1


def init_lm_v1(rng, cfg: LMV1Config) -> dict:
    ks = jax.random.split(rng, 8)
    return {
        "text_embedding": init_embedding(ks[0], cfg.text_token_size, cfg.text_encoder_input_size),
        "text_encoder": init_generic_encoder(ks[1], cfg.text_encoder),
        "text_encoder_affine_layer": init_dense(
            ks[2], cfg.text_encoder.output_size, cfg.llm_input_size
        ),
        "llm_embedding": init_embedding(ks[3], 2, cfg.llm_input_size),  # sos_eos, task
        "speech_embedding": init_embedding(ks[4], cfg.speech_token_size, cfg.llm_input_size),
        "spk_embed_affine_layer": init_dense(ks[5], cfg.spk_embed_dim, cfg.llm_input_size),
        "llm": init_generic_encoder(ks[6], cfg.llm),
        "llm_decoder": init_dense(ks[7], cfg.llm_output_size, cfg.speech_token_size + 1),
    }


def encode_text(params, cfg: LMV1Config, text_token, text_len):
    """text ids -> llm-width vectors (llm.py:164 TransformerLM.encode):
    causal conformer (decoding_chunk_size=1) + affine."""
    emb = embedding(params["text_embedding"], text_token)
    h, _ = generic_encoder_forward(
        params["text_encoder"], cfg.text_encoder, emb, text_len,
        decoding_chunk_size=1, num_decoding_left_chunks=-1,
    )
    return dense(params["text_encoder_affine_layer"], h)


def _normalized_spk(params, emb):
    emb = emb.astype(jnp.float32)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return dense(params["spk_embed_affine_layer"], emb)


def _pack(sos, spk, text_h, text_len, task, speech_emb, speech_len):
    """Vectorized variable-length segment packing (llm.py:175
    pad_unpad_sequence).  spk=None drops the speaker slot — the reference's
    embedding.shape[0] == 0 path (llm.py:297), taken by v1 instruct mode
    (frontend.py:527 deletes llm_embedding).

    sos/task: (D,); spk: (B, D) or None; text_h: (B, Tt, D); speech_emb:
    (B, Ts, D); text_len/speech_len: (B,).  Layout per row:
    [sos, spk?, text[:t], task, speech[:s]] -> (B, off+1+Tt+Ts, D),
    lens off+1+t+s where off = 2 with spk, 1 without.
    """
    b, tt, d = text_h.shape
    ts = speech_emb.shape[1]
    off = 2 if spk is not None else 1  # sos [+ spk]
    L = off + 1 + tt + ts
    j = jnp.arange(L)[None, :]  # (1, L)
    t = text_len[:, None]  # (B, 1)

    text_idx = jnp.clip(j - off, 0, max(tt - 1, 0))
    text_g = jnp.take_along_axis(text_h, jnp.broadcast_to(text_idx, (b, L))[..., None], axis=1)
    sp_idx = jnp.clip(j - off - 1 - t, 0, max(ts - 1, 0))
    sp_g = jnp.take_along_axis(speech_emb, sp_idx[..., None], axis=1)

    out = jnp.where(
        (j < off + t)[..., None], text_g,
        jnp.where((j == off + t)[..., None], task[None, None, :], sp_g),
    )
    if spk is not None:
        out = jnp.where((j == 1)[..., None], spk[:, None, :], out)
    out = jnp.where((j == 0)[..., None], sos[None, None, :], out)
    return out, off + 1 + text_len + speech_len


def lm_v1_training_logits(params, cfg: LMV1Config, batch):
    """Training forward -> (logits (B, L, V+1), targets (B, L)).

    Mirrors llm.py:183 TransformerLM.forward: targets are IGNORE for the
    (2 + text_len)-long prefix, then the speech tokens, then EOS.
    """
    text_token = batch["text_token"]
    text_len = batch["text_token_len"]
    speech_token = batch["speech_token"]
    speech_len = batch["speech_token_len"]

    text_h = encode_text(params, cfg, text_token, text_len)
    spk = _normalized_spk(params, batch["embedding"])
    sos = params["llm_embedding"]["weight"][0]
    task = params["llm_embedding"]["weight"][1]
    sp_emb = embedding(params["speech_embedding"], jnp.clip(speech_token, 0))
    x, lens = _pack(sos, spk, text_h, text_len, task, sp_emb, speech_len)

    h, _ = generic_encoder_forward(params["llm"], cfg.llm, x, lens)
    logits = dense(params["llm_decoder"], h)

    # targets: IGNORE*(2+t) ++ speech ++ eos ++ IGNORE...  (llm.py:196)
    L = x.shape[1]
    j = jnp.arange(L)[None, :]
    t = text_len[:, None]
    s = speech_len[:, None]
    sp_idx = jnp.clip(j - 2 - t, 0, max(speech_token.shape[1] - 1, 0))
    sp_t = jnp.take_along_axis(speech_token, sp_idx, axis=1)
    targets = jnp.where(
        j < 2 + t, IGNORE_ID,
        jnp.where(j - 2 - t < s, sp_t,
                  jnp.where(j - 2 - t == s, cfg.eos_token, IGNORE_ID)),
    )
    return logits, targets


def lm_v1_loss(params, cfg: LMV1Config, batch):
    from cosyvoice2_eu_tpu.train.losses import label_smoothing_ce

    logits, targets = lm_v1_training_logits(params, cfg, batch)
    return label_smoothing_ce(
        logits, targets, smoothing=cfg.lsm_weight,
        normalize_length=cfg.length_normalized_loss,
    )


# ---------------------------------------------------------------------------
# decode (llm.py:267 TransformerLM.inference)
# ---------------------------------------------------------------------------


class V1DecodeState(NamedTuple):
    k: jnp.ndarray  # (layers, B, H, max_cache, d_k)
    v: jnp.ndarray
    tokens: jnp.ndarray  # (B, max_gen)
    recent: jnp.ndarray  # (B, win_size)
    lengths: jnp.ndarray  # (B,)
    finished: jnp.ndarray  # (B,) bool
    last_hidden: jnp.ndarray  # (B, D)
    step: jnp.ndarray
    rng: jax.Array


def _pos_table_positive(max_rel: int, d: int) -> np.ndarray:
    """pe_positive rows for relative distances 0..max_rel-1
    (embedding.py:236: sin/cos interleaved at +position)."""
    pe = np.zeros((max_rel, d), np.float32)
    pos = np.arange(max_rel, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _prefill(params_llm, cfg_llm: GenericEncoderConfig, x, lens, max_cache: int):
    """Packed-prefix forward with causal mask; fills KV slots [0, P_bucket).

    x: (B, P_bucket, D_in).  Returns (k, v, hidden (B, P, D))."""
    b, p_bucket, _ = x.shape
    h_heads = cfg_llm.attention_heads
    d = cfg_llm.output_size
    d_k = d // h_heads

    ones = jnp.ones((b, p_bucket), bool)
    x, _ = apply_input_layer(params_llm, cfg_llm, x, ones)
    x = x * math.sqrt(d)  # espnet xscale
    pos_emb = _full_pos_emb(params_llm, cfg_llm, p_bucket, x.dtype)
    mask = chunk_attention_mask(lens, p_bucket, 1)  # chunk 1 == causal

    ks, vs = [], []
    for lp in params_llm["encoders"]:
        att = lp["self_attn"]
        hn = layer_norm(lp["norm1"], x, cfg_llm.layer_norm_eps)
        q = dense(att["linear_q"], hn).reshape(b, p_bucket, h_heads, d_k)
        k = dense(att["linear_k"], hn).reshape(b, p_bucket, h_heads, d_k).transpose(0, 2, 1, 3)
        v = dense(att["linear_v"], hn).reshape(b, p_bucket, h_heads, d_k).transpose(0, 2, 1, 3)
        ks.append(k)
        vs.append(v)
        x = x + _attention_core(att, cfg_llm, q, k, v, pos_emb, mask)
        x = x + _ffn(lp["feed_forward"], cfg_llm,
                     layer_norm(lp["norm2"], x, cfg_llm.layer_norm_eps))

    pad = max_cache - p_bucket
    k_cache = jnp.pad(jnp.stack(ks), ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    v_cache = jnp.pad(jnp.stack(vs), ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    hidden = layer_norm(params_llm["after_norm"], x, 1e-5)
    return k_cache, v_cache, hidden


def _decode_step(params_llm, cfg_llm: GenericEncoderConfig, pos_proj, x_tok,
                 k_cache, v_cache, prefix_len, p_bucket: int, step):
    """One incremental token through the llm stack.

    x_tok: (B, 1, D_in) new-token embedding (pre input-layer);
    pos_proj: (layers, max_rel, H, d_k) precomputed W_pos @ pe_positive;
    prefix_len: (B,) valid packed-prefix lengths; step: scalar (0-based).
    Returns (hidden (B, D), k_cache, v_cache)."""
    b = x_tok.shape[0]
    h_heads = cfg_llm.attention_heads
    d = cfg_llm.output_size
    d_k = d // h_heads
    max_cache = k_cache.shape[3]
    max_rel = pos_proj.shape[1]

    ones = jnp.ones((b, 1), bool)
    x, _ = apply_input_layer(params_llm, cfg_llm, x_tok, ones)
    x = x * math.sqrt(d)

    slot = jnp.arange(max_cache)
    # absolute position of each cache slot: prefix slots sit at their index,
    # generated slots at prefix_len + (slot - p_bucket)
    slot_pos = jnp.where(slot[None, :] < p_bucket, slot[None, :],
                         prefix_len[:, None] + (slot[None, :] - p_bucket))
    pos_q = prefix_len + step  # (B,)
    visible = (slot[None, :] < prefix_len[:, None]) | (
        (slot[None, :] >= p_bucket) & (slot[None, :] <= p_bucket + step)
    )
    rel = pos_q[:, None] - slot_pos  # (B, max_cache)
    bias = jnp.where(visible & (rel >= 0), 0.0, NEG_INF)  # (B, max_cache)
    rel_idx = jnp.clip(rel, 0, max_rel - 1)

    cache_index = p_bucket + step
    for i, lp in enumerate(params_llm["encoders"]):
        att = lp["self_attn"]
        hn = layer_norm(lp["norm1"], x, cfg_llm.layer_norm_eps)
        q = dense(att["linear_q"], hn).reshape(b, h_heads, d_k)
        k_new = dense(att["linear_k"], hn).reshape(b, h_heads, d_k)
        v_new = dense(att["linear_v"], hn).reshape(b, h_heads, d_k)
        k_cache = k_cache.at[i, :, :, cache_index].set(k_new)
        v_cache = v_cache.at[i, :, :, cache_index].set(v_new)

        q_u = q + att["pos_bias_u"].astype(q.dtype)
        q_v = q + att["pos_bias_v"].astype(q.dtype)
        ac = jnp.einsum("bhd,bhkd->bhk", q_u, k_cache[i])
        qp = jnp.einsum("bhd,nhd->bhn", q_v, pos_proj[i].astype(q.dtype))
        bd = jnp.take_along_axis(
            qp, jnp.broadcast_to(rel_idx[:, None, :], qp.shape[:2] + (max_cache,)), axis=2
        )
        scores = (ac + bd).astype(jnp.float32) / math.sqrt(d_k)
        probs = jax.nn.softmax(scores + bias[:, None, :], axis=-1).astype(x.dtype)
        out = jnp.einsum("bhk,bhkd->bhd", probs, v_cache[i]).reshape(b, h_heads * d_k)
        x = x + dense(att["linear_out"], out)[:, None, :]
        x = x + _ffn(lp["feed_forward"], cfg_llm,
                     layer_norm(lp["norm2"], x, cfg_llm.layer_norm_eps))

    hidden = layer_norm(params_llm["after_norm"], x, 1e-5)[:, 0]
    return hidden, k_cache, v_cache


def lm_v1_decode(
    params,
    cfg: LMV1Config,
    text_token: jnp.ndarray,
    text_len: jnp.ndarray,
    prompt_text_len: jnp.ndarray,
    prompt_speech: jnp.ndarray,
    prompt_speech_len: jnp.ndarray,
    emb: jnp.ndarray,
    rng: jax.Array,
    max_gen: int,
    use_spk: bool = True,
):
    """Full autoregressive decode (llm.py:267 inference).

    text_token: (B, Tt) prompt_text ++ text (padded); prompt_speech:
    (B, Ts) padded (at least one column); emb: (B, spk_embed_dim).
    use_spk=False drops the speaker slot (llm.py:297 embedding.shape[0]==0,
    the v1 instruct path) — emb is then ignored.
    min/max lengths follow llm.py:306: ratios of (text_len - prompt_text_len).
    Returns (tokens (B, max_gen), lengths (B,)).
    """
    cfg_llm = cfg.llm
    text_h = encode_text(params, cfg, text_token, text_len)
    spk = _normalized_spk(params, emb) if use_spk else None
    sos = params["llm_embedding"]["weight"][0]
    task = params["llm_embedding"]["weight"][1]
    sp_emb = embedding(params["speech_embedding"], jnp.clip(prompt_speech, 0))
    x, prefix_len = _pack(sos, spk, text_h, text_len, task, sp_emb, prompt_speech_len)

    b, p_bucket, _ = x.shape
    max_cache = p_bucket + max_gen
    k_cache, v_cache, hidden = _prefill(params["llm"], cfg_llm, x, prefix_len, max_cache)
    last_hidden = jnp.take_along_axis(hidden, (prefix_len - 1)[:, None, None], axis=1)[:, 0]

    n_text = text_len - prompt_text_len
    min_len = (n_text.astype(jnp.float32) * cfg.min_token_text_ratio).astype(jnp.int32)
    max_len = jnp.minimum(
        (n_text.astype(jnp.float32) * cfg.max_token_text_ratio).astype(jnp.int32), max_gen
    )

    # per-layer W_pos @ pe table for decode-time rel-pos (see module docstring)
    table = jnp.asarray(_pos_table_positive(max_cache, cfg_llm.output_size))
    h_heads = cfg_llm.attention_heads
    d_k = cfg_llm.output_size // h_heads
    pos_proj = jnp.stack([
        dense(lp["self_attn"]["linear_pos"], table).reshape(-1, h_heads, d_k)
        for lp in params["llm"]["encoders"]
    ])

    state = V1DecodeState(
        k=k_cache, v=v_cache,
        tokens=jnp.zeros((b, max_gen), jnp.int32),
        recent=jnp.full((b, cfg.win_size), -1, jnp.int32),
        lengths=jnp.zeros((b,), jnp.int32),
        finished=jnp.zeros((b,), bool),
        last_hidden=last_hidden,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )

    def cond(st: V1DecodeState):
        return (~jnp.all(st.finished)) & (st.step < max_gen)

    def body(st: V1DecodeState):
        logits = dense(params["llm_decoder"], st.last_hidden).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # llm.py:321: first token may not be EOS; before min_len EOS ignored
        ignore_eos = (st.lengths < min_len) | (st.step == 0)
        rng, sub = jax.random.split(st.rng)
        keys = jax.random.split(sub, b)
        tok = jax.vmap(
            lambda kk, lg, rec, ig: ras_sample(
                kk, lg, rec, ig, cfg.eos_token,
                top_p=cfg.top_p, top_k=cfg.top_k,
                win_size=cfg.win_size, tau_r=cfg.tau_r,
            )
        )(keys, logp, st.recent, ignore_eos)

        is_eos = tok == cfg.eos_token
        emit = (~st.finished) & (~is_eos)
        col = jnp.arange(max_gen, dtype=jnp.int32)[None, :]
        tokens = jnp.where(
            emit[:, None] & (col == st.lengths[:, None]), tok[:, None], st.tokens
        )
        lengths = st.lengths + emit.astype(jnp.int32)
        finished = st.finished | is_eos | (lengths >= max_len)
        recent = jnp.where(
            emit[:, None], jnp.roll(st.recent, -1, axis=1).at[:, -1].set(tok), st.recent
        )

        x_tok = embedding(
            params["speech_embedding"], jnp.clip(tok, 0, cfg.speech_token_size - 1)
        )[:, None, :]
        hidden, k, v = _decode_step(
            params["llm"], cfg_llm, pos_proj, x_tok, st.k, st.v,
            prefix_len, p_bucket, st.step,
        )
        return V1DecodeState(k, v, tokens, recent, lengths, finished, hidden,
                             st.step + 1, rng)

    state = jax.lax.while_loop(cond, body, state)
    return state.tokens, state.lengths
