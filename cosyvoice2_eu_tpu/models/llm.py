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

import functools
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
        # reference semantics (llm.py:707-718): EOS stops; other specials
        # (fill etc., ids > eos) are fed back but never emitted
        is_eos = tok == cfg.eos_token
        is_special = tok > cfg.eos_token
        emit = (~st.finished) & (~is_eos) & (~is_special)
        # compact write at the emission cursor (specials leave no gaps)
        col = jnp.arange(st.tokens.shape[1], dtype=jnp.int32)[None, :]
        tokens = jnp.where(
            emit[:, None] & (col == st.lengths[:, None]), tok[:, None], st.tokens
        )
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
        # reference semantics (llm.py:707-718): EOS stops; other specials
        # (fill etc., ids > eos) are fed back but never emitted
        is_eos = tok == cfg.eos_token
        is_special = tok > cfg.eos_token
        emit = (~st.finished) & (~is_eos) & (~is_special)
        # compact write at the emission cursor (specials leave no gaps)
        col = jnp.arange(st.tokens.shape[1], dtype=jnp.int32)[None, :]
        tokens = jnp.where(
            emit[:, None] & (col == st.lengths[:, None]), tok[:, None], st.tokens
        )
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


# ---------------------------------------------------------------------------
# bistream decode (streaming text input, reference llm.py:721-834)
# ---------------------------------------------------------------------------

class BistreamState(NamedTuple):
    """Cursor-based single-session cache: slots [0, cache_len) are valid and
    contiguous (prompt segments and generated tokens interleave freely)."""

    kv: KVCache
    cache_len: jnp.ndarray  # scalar int32
    last_hidden: jnp.ndarray  # (1, H)
    recent: jnp.ndarray  # (win_size,)
    n_out: jnp.ndarray  # scalar int32: emitted speech tokens
    rng: jax.Array


def bs_init(params, cfg: LMConfig, max_cache: int) -> BistreamState:
    h = cfg.backbone.hidden_size
    return BistreamState(
        kv=KVCache.zeros(cfg.backbone, 1, max_cache),
        cache_len=jnp.zeros((), jnp.int32),
        last_hidden=jnp.zeros((1, h)),
        recent=jnp.full((cfg.win_size,), -1, jnp.int32),
        n_out=jnp.zeros((), jnp.int32),
        rng=jax.random.key(0),
    )


def bs_extend(params, cfg: LMConfig, state: BistreamState, ids, src, seg_len):
    """Append a right-padded (1, S) segment at the cache cursor.

    Pad slots are written past the new cursor and stay invisible until
    overwritten.  Returns state with last_hidden = hidden of the segment's
    last valid position.
    """
    from cosyvoice2_eu_tpu.models.qwen2 import (
        NEG_INF as _NEG,
        _layer_forward,
        rope_cos_sin,
    )
    from cosyvoice2_eu_tpu.utils.params import rms_norm as _rms

    bb = cfg.backbone
    s = ids.shape[1]
    max_cache = state.kv.k.shape[3]
    embeds = embed_mixed(params, ids, src)

    pos = state.cache_len + jnp.arange(s, dtype=jnp.int32)
    slot = jnp.arange(max_cache, dtype=jnp.int32)
    # query i sees cache slots < cache_len + i + 1
    mask = slot[None, None, :] < (state.cache_len + jnp.arange(s)[:, None] + 1)[None]
    bias = jnp.where(mask, 0.0, _NEG)[:, None]
    cos, sin = rope_cos_sin(pos[None], bb)

    x = embeds
    kv = state.kv
    for i, lp in enumerate(params["backbone"]["layers"]):
        x, kv = _layer_forward(
            lp, bb, x, cos[0], sin[0], bias, kv=kv, layer_idx=i, write_at=state.cache_len
        )
    x = _rms(params["backbone"]["norm"], x, bb.rms_norm_eps)
    last = jnp.take_along_axis(x, (seg_len - 1)[None, None, None], axis=1)[:, 0]
    return state._replace(kv=kv, cache_len=state.cache_len + seg_len, last_hidden=last)


def bs_decode(
    params,
    cfg: LMConfig,
    state: BistreamState,
    out_capacity: int,
    next_fill_index: jnp.ndarray,
    allow_eos: jnp.ndarray,
    max_emit: jnp.ndarray,
):
    """Decode until a fill token, EOS (when allowed), or max_emit new speech
    tokens.  Forced fills fire when n_out == next_fill_index
    (reference llm.py:799-806).

    Returns (state, out_tokens (out_capacity,), n_new, stop_code) with
    stop_code 0 = hit max_emit, 1 = fill token, 2 = eos.
    """
    from cosyvoice2_eu_tpu.models.qwen2 import qwen2_decode_step

    bb = cfg.backbone
    max_cache = state.kv.k.shape[3]
    slot = jnp.arange(max_cache, dtype=jnp.int32)[None, :]
    fill_id = cfg.speech_token_size + 2

    def make_carry(st, out, n_new, nfi, stop):
        return (st, out, n_new, nfi, stop)

    def cond(carry):
        st, out, n_new, nfi, stop = carry
        return (stop == 0) & (n_new < max_emit) & (st.cache_len < max_cache - 1)

    def body(carry):
        st, out, n_new, nfi, stop = carry
        logits = dense(params["llm_decoder"], st.last_hidden).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)[0]
        rng, sub = jax.random.split(st.rng)
        # ban only the exact EOS id when not allowed (fill stays samplable)
        banned_eos = jnp.where(
            allow_eos, jnp.zeros_like(logp), jnp.zeros_like(logp).at[cfg.eos_token].set(-jnp.inf)
        )
        sampled = ras_sample(
            sub, logp + banned_eos, st.recent, jnp.asarray(False), cfg.full_vocab,
            top_p=cfg.top_p, top_k=cfg.top_k, win_size=cfg.win_size, tau_r=cfg.tau_r,
        )
        forced = (nfi >= 0) & (st.n_out == nfi)
        tok = jnp.where(forced, fill_id, sampled)
        nfi = jnp.where(forced, nfi + cfg.mix_ratio[1] + 1, nfi)
        nfi = jnp.where((~forced) & (tok == fill_id), st.n_out + cfg.mix_ratio[1] + 1, nfi)

        is_fill = tok == fill_id
        is_eos = tok == cfg.eos_token
        # any special id (>= speech_token_size) feeds back but is never
        # exported (reference llm.py:711-714)
        emit = tok < cfg.speech_token_size
        out = jnp.where(emit, out.at[n_new].set(tok), out)
        recent = jnp.where(
            emit, jnp.roll(st.recent, -1).at[-1].set(tok), st.recent
        )

        embed = embedding(params["speech_embedding"], jnp.clip(tok, 0, cfg.full_vocab - 1))[None]
        visible = slot <= st.cache_len
        hidden, kv = qwen2_decode_step(
            params["backbone"], bb, embed, st.cache_len[None], st.cache_len, visible, st.kv
        )
        new_st = BistreamState(
            kv, st.cache_len + 1, hidden, recent,
            st.n_out + emit.astype(jnp.int32), rng,
        )
        stop = jnp.where(is_fill, 1, jnp.where(is_eos, 2, 0)).astype(jnp.int32)
        return make_carry(new_st, out, n_new + emit.astype(jnp.int32), nfi, stop)

    out0 = jnp.zeros((out_capacity,), jnp.int32)
    carry = make_carry(state, out0, jnp.zeros((), jnp.int32), next_fill_index,
                       jnp.zeros((), jnp.int32))
    st, out, n_new, nfi, stop = jax.lax.while_loop(cond, body, carry)
    return st, out, n_new, nfi, stop


@functools.lru_cache(maxsize=8)
def _bistream_jits(cfg: LMConfig, chunk_capacity: int):
    """One jitted extend/decode pair per (config, capacity), shared across
    lm_inference_bistream calls: a fresh jax.jit wrapper per call would
    re-trace and re-lower the 0.5B decode program on EVERY streaming-text
    request (tens of seconds of host time even with compiles cached).

    Params are ARGUMENTS, never closures: closed-over params inline as HLO
    constants (gigabytes in the compile request -> the remote compile
    service drops the connection, minutes of lowering)."""
    extend_j = jax.jit(
        lambda pp, st, ids, src, n: bs_extend(pp, cfg, st, ids, src, n)
    )
    decode_j = jax.jit(
        lambda pp, st, nfi, allow, cap: bs_decode(
            pp, cfg, st, chunk_capacity, nfi, allow, cap
        )
    )
    return extend_j, decode_j


def lm_inference_bistream(
    params,
    cfg: LMConfig,
    text_chunks,
    prompt_text: "np.ndarray",
    prompt_speech: "np.ndarray",
    rng: jax.Array,
    max_cache: int = 2048,
    seg_bucket: int = 64,
    chunk_capacity: int = 64,
):
    """Streaming-text decode generator yielding speech tokens.

    Mirrors inference_bistream (reference llm.py:721-834): text arrives in
    mix_ratio[0]-token chunks; prompt text+speech are interleaved 5:15; the
    model requests more text via the FILL token; the final segment appends
    [remaining text, task_id] and decodes to EOS.
    """
    import numpy as np

    mt, ms = cfg.mix_ratio

    extend_j, decode_j = _bistream_jits(cfg, chunk_capacity)
    extend = lambda st, ids, src, n: extend_j(params, st, ids, src, n)
    decode = lambda st, nfi, allow, cap: decode_j(params, st, nfi, allow, cap)

    def seg(tokens_src):  # list of (id, src) -> padded arrays
        n = len(tokens_src)
        ids = np.zeros((1, seg_bucket), np.int32)
        src = np.zeros((1, seg_bucket), np.int32)
        for i, (tid, ts) in enumerate(tokens_src):
            ids[0, i], src[0, i] = tid, ts
        return jnp.asarray(ids), jnp.asarray(src), jnp.asarray(n, jnp.int32)

    state = bs_init(params, cfg, max_cache)._replace(rng=rng)
    state = extend(state, *seg([(cfg.sos_eos, SRC_SPECIAL)]))

    text_cache = [int(t) for t in prompt_text]
    speech_left = [int(t) for t in prompt_speech]
    next_fill = jnp.asarray(-1, jnp.int32)
    need_text = True  # nothing appended beyond sos yet (llm.py:781)

    for this_text in text_chunks:
        text_cache.extend(int(t) for t in this_text)
        # interleave prompt speech with text 5:15, coalescing every pair this
        # text piece unlocks into ONE padded extend (a 150-token prompt costs
        # ~4 dispatches instead of 10 — first-audio latency is dispatch-bound
        # on the bistream path, VERDICT r4 next #7)
        pairs = []
        while speech_left and len(text_cache) >= mt:
            pairs += [(t, SRC_TEXT) for t in text_cache[:mt]] + [
                (s, SRC_SPEECH) for s in speech_left[:ms]
            ]
            text_cache, speech_left = text_cache[mt:], speech_left[ms:]
        for start in range(0, len(pairs), seg_bucket):
            state = extend(state, *seg(pairs[start : start + seg_bucket]))
        if speech_left:
            continue  # wait for more text to finish the interleave
        if need_text:
            if len(text_cache) < mt:
                continue  # wait for more text
            state = extend(state, *seg([(t, SRC_TEXT) for t in text_cache[:mt]]))
            text_cache = text_cache[mt:]
            need_text = False
        # decode until the model requests more text with a FILL token
        while True:
            state, out, n_new, next_fill, stop = decode(
                state, next_fill, jnp.asarray(False), jnp.asarray(chunk_capacity)
            )
            for t in np.asarray(out)[: int(n_new)]:
                yield int(t)
            if int(stop) == 1:  # fill
                need_text = True
                break
            if int(n_new) == 0:
                break

    # final: remaining text + task id, decode to EOS
    pairs = [(t, SRC_TEXT) for t in text_cache] + [(cfg.task_id, SRC_SPECIAL)]
    for start in range(0, len(pairs), seg_bucket):
        state = extend(state, *seg(pairs[start : start + seg_bucket]))
    while True:
        state, out, n_new, next_fill, stop = decode(
            state, jnp.asarray(-1, jnp.int32), jnp.asarray(True), jnp.asarray(chunk_capacity)
        )
        for t in np.asarray(out)[: int(n_new)]:
            yield int(t)
        if int(stop) == 2 or int(n_new) == 0:
            break


# ---------------------------------------------------------------------------
# continuous batching (slot-based serving decode)
# ---------------------------------------------------------------------------


class SlotState(NamedTuple):
    """Fixed-capacity decode slots: requests join/leave at chunk boundaries.

    The TPU-native analog of the reference's optional vLLM engine
    (cosy_repo/cosyvoice/vllm/cosyvoice2.py, cli/model.py:289-298): a static
    (n_slots, max_cache) HBM KV cache where each row runs an independent
    request — its own prompt bucket `base`, decode step, length bounds and
    RAS window — advanced in lockstep by `slots_decode`.
    """

    kv: KVCache
    tokens: jnp.ndarray      # (B, max_gen) emitted ids per slot
    recent: jnp.ndarray      # (B, win_size) RAS window
    lengths: jnp.ndarray     # (B,) emitted counts
    finished: jnp.ndarray    # (B,) bool
    active: jnp.ndarray      # (B,) bool — slot occupied
    last_hidden: jnp.ndarray # (B, H)
    gen_step: jnp.ndarray    # (B,) decode steps taken (specials included)
    base: jnp.ndarray        # (B,) cache offset where generation starts (= prompt bucket)
    prompt_len: jnp.ndarray  # (B,)
    min_len: jnp.ndarray     # (B,)
    max_len: jnp.ndarray     # (B,)
    rng: jax.Array


def slots_init(cfg: LMConfig, n_slots: int, max_cache: int, max_gen: int,
               rng: jax.Array, dtype=jnp.bfloat16) -> SlotState:
    h = cfg.backbone.hidden_size
    return SlotState(
        kv=KVCache.zeros(cfg.backbone, n_slots, max_cache, dtype),
        tokens=jnp.zeros((n_slots, max_gen), jnp.int32),
        recent=jnp.full((n_slots, cfg.win_size), -1, jnp.int32),
        lengths=jnp.zeros((n_slots,), jnp.int32),
        finished=jnp.zeros((n_slots,), bool),
        active=jnp.zeros((n_slots,), bool),
        last_hidden=jnp.zeros((n_slots, h), dtype),
        gen_step=jnp.zeros((n_slots,), jnp.int32),
        base=jnp.zeros((n_slots,), jnp.int32),
        prompt_len=jnp.zeros((n_slots,), jnp.int32),
        min_len=jnp.zeros((n_slots,), jnp.int32),
        max_len=jnp.zeros((n_slots,), jnp.int32),
        rng=rng,
    )


def slot_prefill(
    params, cfg: LMConfig, state: SlotState, slot: jnp.ndarray,
    ids: jnp.ndarray, src: jnp.ndarray, prompt_len: jnp.ndarray,
    min_len: jnp.ndarray, max_len: jnp.ndarray,
) -> SlotState:
    """Admit one request into `slot`: prefill its prompt into that KV row.

    ids/src: (1, P_bucket); one compiled program per P_bucket.
    """
    p_bucket = ids.shape[1]
    row = KVCache(
        jax.lax.dynamic_slice_in_dim(state.kv.k, slot, 1, axis=1),
        jax.lax.dynamic_slice_in_dim(state.kv.v, slot, 1, axis=1),
    )
    embeds = embed_mixed(params, ids, src)
    last, row = qwen2_prefill(
        params["backbone"], cfg.backbone, embeds, prompt_len[None], row
    )
    kv = KVCache(
        jax.lax.dynamic_update_slice_in_dim(state.kv.k, row.k, slot, axis=1),
        jax.lax.dynamic_update_slice_in_dim(state.kv.v, row.v, slot, axis=1),
    )

    def put(arr, val):
        return arr.at[slot].set(jnp.asarray(val, arr.dtype))

    return state._replace(
        kv=kv,
        tokens=state.tokens.at[slot].set(0),
        recent=state.recent.at[slot].set(-1),
        lengths=put(state.lengths, 0),
        finished=put(state.finished, False),
        active=put(state.active, True),
        last_hidden=state.last_hidden.at[slot].set(last[0].astype(state.last_hidden.dtype)),
        gen_step=put(state.gen_step, 0),
        base=put(state.base, p_bucket),
        prompt_len=put(state.prompt_len, prompt_len),
        min_len=put(state.min_len, min_len),
        max_len=put(state.max_len, max_len),
    )


def prefill_row(params, cfg: LMConfig, ids: jnp.ndarray, src: jnp.ndarray,
                prompt_len: jnp.ndarray, max_cache: int, dtype=jnp.bfloat16):
    """Pure prompt prefill into a standalone KV row: (row, last_hidden).

    No dependency on the engine's SlotState, so the serving engine can
    dispatch it the moment a request arrives — overlapping with ongoing
    slot decode — and merge it later with the tiny slot_insert op at a
    chunk boundary (admission no longer stalls live streams)."""
    row = KVCache.zeros(cfg.backbone, 1, max_cache, dtype)
    embeds = embed_mixed(params, ids, src)
    last, row = qwen2_prefill(
        params["backbone"], cfg.backbone, embeds, prompt_len[None], row
    )
    return row, last


def slot_insert(
    state: SlotState, slot: jnp.ndarray, row: KVCache, last: jnp.ndarray,
    prompt_len: jnp.ndarray, min_len: jnp.ndarray, max_len: jnp.ndarray,
    p_bucket: jnp.ndarray,
) -> SlotState:
    """Merge a prefilled row (prefill_row) into `slot`.  O(row-copy) — no
    forward pass; equivalent to slot_prefill given the same inputs."""
    kv = KVCache(
        jax.lax.dynamic_update_slice_in_dim(
            state.kv.k, row.k.astype(state.kv.k.dtype), slot, axis=1),
        jax.lax.dynamic_update_slice_in_dim(
            state.kv.v, row.v.astype(state.kv.v.dtype), slot, axis=1),
    )

    def put(arr, val):
        return arr.at[slot].set(jnp.asarray(val, arr.dtype))

    return state._replace(
        kv=kv,
        tokens=state.tokens.at[slot].set(0),
        recent=state.recent.at[slot].set(-1),
        lengths=put(state.lengths, 0),
        finished=put(state.finished, False),
        active=put(state.active, True),
        last_hidden=state.last_hidden.at[slot].set(
            last[0].astype(state.last_hidden.dtype)),
        gen_step=put(state.gen_step, 0),
        base=put(state.base, p_bucket),
        prompt_len=put(state.prompt_len, prompt_len),
        min_len=put(state.min_len, min_len),
        max_len=put(state.max_len, max_len),
    )


def slots_decode(params, cfg: LMConfig, state: SlotState, k_steps: int) -> SlotState:
    """Advance every active, unfinished slot by up to k_steps decode steps."""
    max_cache = state.kv.k.shape[3]
    max_gen = state.tokens.shape[1]
    slot_idx = jnp.arange(max_cache, dtype=jnp.int32)[None, :]

    def step_body(st: SlotState) -> SlotState:
        run = st.active & (~st.finished)
        logits = dense(params["llm_decoder"], st.last_hidden).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ignore_eos = (st.lengths < st.min_len) | (st.gen_step == 0)
        rng, sub = jax.random.split(st.rng)
        keys = jax.random.split(sub, logp.shape[0])
        tok = jax.vmap(
            lambda k, lg, rec, ig: ras_sample(
                k, lg, rec, ig, cfg.eos_token,
                top_p=cfg.top_p, top_k=cfg.top_k,
                win_size=cfg.win_size, tau_r=cfg.tau_r,
            )
        )(keys, logp, st.recent, ignore_eos)

        is_eos = tok == cfg.eos_token
        is_special = tok > cfg.eos_token
        emit = run & (~is_eos) & (~is_special)
        col = jnp.arange(max_gen, dtype=jnp.int32)[None, :]
        tokens = jnp.where(
            emit[:, None] & (col == st.lengths[:, None]), tok[:, None], st.tokens
        )
        lengths = st.lengths + emit.astype(jnp.int32)
        finished = st.finished | (run & (is_eos | (lengths >= st.max_len)))
        recent = jnp.where(
            emit[:, None], jnp.roll(st.recent, -1, axis=1).at[:, -1].set(tok), st.recent
        )

        embed = embedding(params["speech_embedding"], jnp.clip(tok, 0, cfg.full_vocab - 1))
        cache_index = jnp.clip(st.base + st.gen_step, 0, max_cache - 1)
        rope_pos = st.prompt_len + st.gen_step
        visible = (slot_idx < st.prompt_len[:, None]) | (
            (slot_idx >= st.base[:, None]) & (slot_idx <= cache_index[:, None])
        )
        hidden, kv = qwen2_decode_step(
            params["backbone"], cfg.backbone, embed, rope_pos, cache_index, visible, st.kv
        )
        last_hidden = jnp.where(run[:, None], hidden.astype(st.last_hidden.dtype), st.last_hidden)
        gen_step = st.gen_step + run.astype(jnp.int32)
        # guard the cache capacity: a slot at the end of its row finishes
        finished = finished | (run & (st.base + gen_step >= max_cache - 1))
        return SlotState(kv, tokens, recent, lengths, finished, st.active,
                         last_hidden, gen_step, st.base, st.prompt_len,
                         st.min_len, st.max_len, rng)

    # while_loop with an early-exit condition (the same structure as
    # lm_decode): stops as soon as no slot can make progress
    def cond(carry):
        i, st = carry
        return (i < k_steps) & jnp.any(st.active & (~st.finished))

    def body(carry):
        i, st = carry
        return i + 1, step_body(st)

    _, state = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), state))
    return state
