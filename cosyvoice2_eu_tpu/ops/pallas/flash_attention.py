"""Fused flash attention with on-the-fly padding/chunk masks (Pallas TPU).

The flow estimator's transformer stages attend over up to ~3000 mel frames;
materializing (B, H, T, T) scores + the reference's additive chunk-mask bias
(cosy_repo/cosyvoice/flow/decoder.py:439-443 + utils/mask.py:161) costs
hundreds of MB of HBM traffic per stage.  This kernel computes
softmax(QK^T/sqrt(d))V with online (streaming) softmax in VMEM and generates
the mask per tile from scalar lengths/chunk indices, so nothing quadratic
ever touches HBM.

Mask semantics == ops.masks.chunk_attention_mask:
  * key position j visible iff j < length[b]
  * chunk_size > 0: query i sees j iff j // chunk < i // chunk + 1
    (full left context with num_left_chunks = -1, the only mode CosyVoice2
    uses; upsample_encoder.py:285,298)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _fit_block(block: int, t: int) -> int:
    """Largest divisor of ``t`` that is a multiple of 128 (lane-aligned),
    capped at ``block``; ``t`` itself when t <= block and already divides.

    Buckets are multiples of 128 but not of each other (e.g. t=384 with the
    default 256 block), so the requested block must shrink to a divisor
    rather than assert (bench r4 train-flow hit exactly t=384)."""
    b = min(block, t)
    if t % b == 0:
        return b
    b -= b % 128
    while b >= 128 and t % b:
        b -= 128
    if b < 128 or t % b:
        raise ValueError(
            f"flash_attention: T={t} has no lane-aligned block <= {block}; "
            "pad T to a multiple of 128")
    return b


def _attn_kernel(
    length_ref,  # SMEM (1,)
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, T, D)
    v_ref,  # (1, T, D)
    o_ref,  # (1, BQ, D)
    *,
    block_q: int,
    block_k: int,
    t_kv: int,
    sm_scale: float,
    chunk_size: int,
):
    bh_idx = pl.program_id(0)
    q_idx = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (BQ, D)
    length = length_ref[bh_idx, 0]

    row = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    if chunk_size > 0:
        # last visible key index (exclusive) per query row
        row_limit = (row[:, 0:1] // chunk_size + 1) * chunk_size
        max_visible = jnp.minimum(row_limit, length)
    else:
        max_visible = jnp.full((block_q, 1), length, jnp.int32)

    num_k_blocks = t_kv // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < max_visible, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    if chunk_size > 0:
        # skip key blocks entirely beyond this query block's visibility
        max_vis_block = (((q_idx + 1) * block_q - 1) // chunk_size + 1) * chunk_size
        n_blocks = jnp.minimum(
            pl.cdiv(jnp.minimum(max_vis_block, t_kv), block_k), num_k_blocks
        )
    else:
        n_blocks = num_k_blocks

    d = q_ref.shape[-1]
    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("chunk_size", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    chunk_size: int = 0,
    sm_scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (B, H, T, D) -> (B, H, T, D).  T must be a multiple of the block
    sizes (the runtime's buckets are multiples of 128); pad queries attend
    valid keys and their outputs are discarded by the caller's masks."""
    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_q = _fit_block(block_q, t)
    block_k = _fit_block(block_k, t)
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    lengths_bh = jnp.repeat(lengths.astype(jnp.int32), h)

    kernel = functools.partial(
        _attn_kernel,
        block_q=block_q,
        block_k=block_k,
        t_kv=t,
        sm_scale=sm_scale,
        chunk_size=chunk_size,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        interpret=interpret,
    )(lengths_bh[:, None], qf, kf, vf)
    return out.reshape(b, h, t, d)


def attention_backend() -> str:
    """'pallas' on real TPU backends, 'xla' elsewhere (tests/CPU)."""
    import os

    override = os.environ.get("COSY_TPU_FLASH")
    if override is not None:
        return "pallas" if override == "1" else "xla"
    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
