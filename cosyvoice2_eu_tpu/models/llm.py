"""Speech-token language model (Qwen2 backbone + speech head).

TPU-native re-design of the reference Qwen2LM
(reference: cosy_repo/cosyvoice/llm/llm.py:350).  Differences by design:

* The prompt ``[sos, text..., task_id, prompt_speech...]`` is passed as a
  right-padded (ids, src) pair, where ``src`` selects the embedding table
  (0 = llm_embedding specials, 1 = backbone text embeddings, 2 = speech
  embeddings).  This keeps every shape static for XLA.
* The AR decode loop is a single ``lax.while_loop`` over a pre-allocated HBM
  KV cache (reference runs a Python loop with HF ``past_key_values``,
  llm.py:681-719).
* The host-side sampling retry loops (RAS + EOS rejection,
  utils/common.py:111, llm.py:235) are replaced by the masked sampler in
  ops/sampling.py, executed on-device every step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import LMConfig
from cosyvoice2_eu_tpu.models.qwen2 import (
    KVCache,
    init_qwen2,
    qwen2_decode_step,
    qwen2_forward,
    qwen2_prefill,
)
from cosyvoice2_eu_tpu.ops.sampling import ras_sample
from cosyvoice2_eu_tpu.utils.params import dense, embedding, init_dense, init_embedding

SRC_SPECIAL = 0  # llm_embedding table (sos_eos / task_id)
SRC_TEXT = 1  # backbone embed_tokens
SRC_SPEECH = 2  # speech_embedding


def init_lm(rng, cfg: LMConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    h = cfg.backbone.hidden_size
    return {
        "backbone": init_qwen2(k1, cfg.backbone),
        "llm_embedding": init_embedding(k2, 2, h),
        "speech_embedding": init_embedding(k3, cfg.full_vocab, h),
        "llm_decoder": init_dense(k4, h, cfg.full_vocab, bias=True),
    }


def embed_mixed(params, ids: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """(B, T) ids + table selector -> (B, T, H) embeddings."""
    safe = jnp.maximum(ids, 0)
    e_special = embedding(params["llm_embedding"], jnp.clip(safe, 0, 1))
    e_text = embedding(params["backbone"]["embed_tokens"], safe)
    e_speech = embedding(params["speech_embedding"], jnp.clip(safe, 0, params["speech_embedding"]["weight"].shape[0] - 1))
    sel = src[..., None]
    return jnp.where(sel == SRC_TEXT, e_text, jnp.where(sel == SRC_SPEECH, e_speech, e_special))


class DecodeState(NamedTuple):
    kv: KVCache
    tokens: jnp.ndarray  # (B, max_gen) generated ids (eos excluded)
    recent: jnp.ndarray  # (B, win_size) rolling window for RAS
    lengths: jnp.ndarray  # (B,) number of emitted tokens
    finished: jnp.ndarray  # (B,) bool
    last_hidden: jnp.ndarray  # (B, H) hidden of last consumed position
    step: jnp.ndarray  # scalar int32
    rng: jax.Array


def lm_prefill(params, cfg: LMConfig, ids, src, prompt_len, rng, max_gen: int) -> DecodeState:
    """Run the prompt through the backbone and initialize decode state."""
    b, p_bucket = ids.shape
    embeds = embed_mixed(params, ids, src)
    kv = KVCache.zeros(cfg.backbone, b, p_bucket + max_gen)
    last, kv = qwen2_prefill(params["backbone"], cfg.backbone, embeds, prompt_len, kv)
    return DecodeState(
        kv=kv,
        tokens=jnp.zeros((b, max_gen), jnp.int32),
        recent=jnp.full((b, cfg.win_size), -1, jnp.int32),
        lengths=jnp.zeros((b,), jnp.int32),
        finished=jnp.zeros((b,), bool),
        last_hidden=last,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def _sample_tokens(params, cfg: LMConfig, state: DecodeState, prompt_len, min_len, max_len):
    """Sample one token per batch element from state.last_hidden."""
    logits = dense(params["llm_decoder"], state.last_hidden).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ignore_eos = (state.lengths < min_len) | (state.step == 0)
    rng, sub = jax.random.split(state.rng)
    keys = jax.random.split(sub, logp.shape[0])
    tok = jax.vmap(
        lambda k, lg, rec, ig: ras_sample(
            k, lg, rec, ig, cfg.eos_token,
            top_p=cfg.top_p, top_k=cfg.top_k,
            win_size=cfg.win_size, tau_r=cfg.tau_r,
        )
    )(keys, logp, state.recent, ignore_eos)
    return tok, rng


def lm_decode(
    params,
    cfg: LMConfig,
    ids: jnp.ndarray,
    src: jnp.ndarray,
    prompt_len: jnp.ndarray,
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    rng: jax.Array,
    max_gen: int,
):
    """Full autoregressive decode.

    Args:
      ids/src: (B, P_bucket) packed prompt (see embed_mixed).
      prompt_len: (B,) valid prompt lengths.
      min_len/max_len: (B,) decode length bounds (2x/20x text len, reference
        llm.py:643-644).
      max_gen: static generation capacity.

    Returns (tokens (B, max_gen), lengths (B,)).
    """
    b, p_bucket = ids.shape
    max_cache = p_bucket + max_gen
    state = lm_prefill(params, cfg, ids, src, prompt_len, rng, max_gen)

    slot_idx = jnp.arange(max_cache, dtype=jnp.int32)[None, :]

    def cond(st: DecodeState):
        return (~jnp.all(st.finished)) & (st.step < max_gen)

    def body(st: DecodeState):
        tok, rng = _sample_tokens(params, cfg, st, prompt_len, min_len, max_len)
        is_eos = tok >= cfg.eos_token
        emit = (~st.finished) & (~is_eos)
        tokens = st.tokens.at[:, st.step].set(jnp.where(emit, tok, 0))
        lengths = st.lengths + emit.astype(jnp.int32)
        finished = st.finished | is_eos | (lengths >= max_len)

        recent = jnp.where(
            emit[:, None], jnp.roll(st.recent, -1, axis=1).at[:, -1].set(tok), st.recent
        )

        # feed the sampled token back through the backbone
        embed = embedding(params["speech_embedding"], jnp.clip(tok, 0, cfg.full_vocab - 1))
        cache_index = p_bucket + st.step
        rope_pos = prompt_len + st.step
        visible = (slot_idx < prompt_len[:, None]) | (
            (slot_idx >= p_bucket) & (slot_idx <= cache_index)
        )
        hidden, kv = qwen2_decode_step(
            params["backbone"], cfg.backbone, embed, rope_pos, cache_index, visible, st.kv
        )
        return DecodeState(kv, tokens, recent, lengths, finished, hidden, st.step + 1, rng)

    state = jax.lax.while_loop(cond, body, state)
    return state.tokens, state.lengths


def lm_decode_chunk(
    params,
    cfg: LMConfig,
    state: DecodeState,
    prompt_len: jnp.ndarray,
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    p_bucket: int,
    target_step: jnp.ndarray,
):
    """Decode until ``state.step == target_step`` (dynamic bound, so one
    compiled program serves every streaming chunk size); same body as
    lm_decode but resumable — used by the chunked streaming runtime."""
    max_cache = state.kv.k.shape[3]
    max_gen = state.tokens.shape[1]
    slot_idx = jnp.arange(max_cache, dtype=jnp.int32)[None, :]
    target = jnp.minimum(target_step, max_gen)

    def cond(st: DecodeState):
        return (~jnp.all(st.finished)) & (st.step < target)

    def body(st: DecodeState):
        tok, rng = _sample_tokens(params, cfg, st, prompt_len, min_len, max_len)
        is_eos = tok >= cfg.eos_token
        emit = (~st.finished) & (~is_eos)
        tokens = st.tokens.at[:, st.step].set(jnp.where(emit, tok, 0))
        lengths = st.lengths + emit.astype(jnp.int32)
        finished = st.finished | is_eos | (lengths >= max_len)
        recent = jnp.where(
            emit[:, None], jnp.roll(st.recent, -1, axis=1).at[:, -1].set(tok), st.recent
        )
        embed = embedding(params["speech_embedding"], jnp.clip(tok, 0, cfg.full_vocab - 1))
        cache_index = p_bucket + st.step
        rope_pos = prompt_len + st.step
        visible = (slot_idx < prompt_len[:, None]) | (
            (slot_idx >= p_bucket) & (slot_idx <= cache_index)
        )
        hidden, kv = qwen2_decode_step(
            params["backbone"], cfg.backbone, embed, rope_pos, cache_index, visible, st.kv
        )
        return DecodeState(kv, tokens, recent, lengths, finished, hidden, st.step + 1, rng)

    return jax.lax.while_loop(cond, body, state)


def lm_training_hidden(params, cfg: LMConfig, ids, src, valid):
    """Training-time forward over packed (ids, src) sequences.

    Returns logits (B, T, full_vocab).  Loss lives in train/losses.py.
    Reference: llm.py:479 (forward) after prepare_lm_input_target.
    """
    embeds = embed_mixed(params, ids, src)
    hidden = qwen2_forward(params["backbone"], cfg.backbone, embeds, valid)
    return dense(params["llm_decoder"], hidden)
