"""Chunk-cached streaming flow == full-prefix recompute (exact equality).

The cached path (models/flow_streaming.py) must reproduce the reference
semantics of re-running the whole prefix with chunked attention masks
(flow.py:235 streaming=True, finalize=False) for every chunk.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import tiny_test_config
from cosyvoice2_eu_tpu.models.flow import flow_inference, init_flow
from cosyvoice2_eu_tpu.models.flow_streaming import (
    flow_chunk,
    init_flow_stream_state,
    prepare_stream_params,
)

CFG = tiny_test_config().flow
HOP = CFG.encoder.static_chunk_size  # 25
LA = CFG.pre_lookahead_len  # 3


@pytest.fixture(scope="module")
def setup():
    params = init_flow(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    n_chunks = 3
    total = HOP * n_chunks + LA  # enough for 3 full chunks + lookahead
    tokens = rng.integers(0, CFG.vocab_size, (1, total)).astype(np.int32)
    xvec = rng.standard_normal((1, CFG.spk_embed_dim)).astype(np.float32)
    return params, tokens, xvec, n_chunks


def _reference_chunk(params, tokens, xvec, offset, hop):
    """Full-prefix recompute slice, as the reference orchestrator does."""
    upto = offset + hop + LA
    mel = flow_inference(
        params, CFG,
        jnp.asarray(tokens[:, :upto]), jnp.asarray([upto]),
        jnp.zeros((1, 8, CFG.output_size)), jnp.asarray([0]),
        jnp.asarray(xvec), streaming=True, finalize=False,
    )
    return np.asarray(mel)[:, :, offset * 2 : (offset + hop) * 2]


def test_cached_equals_recompute(setup):
    params, tokens, xvec, n_chunks = setup
    sparams = prepare_stream_params(params, CFG, t_tok_max=128)
    state = init_flow_stream_state(CFG, t_tok_max=128, dtype=jnp.float32)

    for c in range(n_chunks):
        offset = c * HOP
        tok_new = jnp.asarray(tokens[:, offset : offset + HOP])
        ctx = jnp.asarray(tokens[:, offset + HOP : offset + HOP + LA])
        cond = jnp.zeros((1, HOP * 2, CFG.output_size))
        got, state = flow_chunk(sparams, CFG, state, tok_new, ctx, jnp.asarray(xvec), cond)
        want = _reference_chunk(params, tokens, xvec, offset, HOP)
        np.testing.assert_allclose(
            np.asarray(got), want, atol=2e-3, rtol=1e-2,
            err_msg=f"chunk {c} mismatch",
        )
