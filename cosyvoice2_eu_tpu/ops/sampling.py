"""Repetition-aware sampling (RAS, VALL-E 2) as a jit-able JAX op.

Reference semantics: cosy_repo/cosyvoice/utils/common.py:111-139 (ras_sampling /
nucleus_sampling / random_sampling) and cosy_repo/cosyvoice/llm/llm.py:235
(sampling_ids EOS-reject loop).  The host-side retry loops are re-expressed as
masking so the whole decode step lives inside lax.while_loop:

* top-p/top-k nucleus: take the smallest prefix of the top-k sorted probs whose
  exclusive cumulative mass is < top_p (always includes the argmax).
* repetition check: if the drawn token already appeared >= win_size * tau_r
  times in the last win_size tokens, redraw from the full softmax.
* ignore_eos: stop tokens (ids >= eos) are masked out of the distribution
  instead of being rejected-and-retried.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def ras_sample(
    rng: jax.Array,
    logits: jnp.ndarray,
    recent_tokens: jnp.ndarray,
    ignore_eos: jnp.ndarray,
    eos: int,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
) -> jnp.ndarray:
    """Draw one speech token id.

    Args:
      rng: PRNG key.
      logits: (V,) unnormalized logits over the speech vocab (+3 specials).
      recent_tokens: (win_size,) last decoded ids, -1 padded.
      ignore_eos: scalar bool; when True all ids >= eos are banned.
      eos: first stop-token id (== speech_token_size).
    """
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab, dtype=jnp.int32)
    banned = ignore_eos & (ids >= eos)
    logits = jnp.where(banned, NEG_INF, logits)

    probs = jax.nn.softmax(logits)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)
    cum_excl = jnp.cumsum(top_vals) - top_vals
    in_nucleus = cum_excl < top_p  # element 0 always in
    nucleus_logits = jnp.where(in_nucleus, jnp.log(jnp.maximum(top_vals, 1e-30)), NEG_INF)

    rng_nuc, rng_full = jax.random.split(rng)
    draw = jax.random.categorical(rng_nuc, nucleus_logits)
    top_id = top_idx[draw].astype(jnp.int32)

    rep_num = jnp.sum(recent_tokens == top_id)
    resample = rep_num >= jnp.asarray(win_size * tau_r)
    full_id = jax.random.categorical(rng_full, logits).astype(jnp.int32)
    return jnp.where(resample, full_id, top_id)
