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


def _max_visible(q_idx, block_q, block_k, length, chunk_size):
    """Per-query-row exclusive key-visibility bound (chunk + length mask)."""
    row = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    if chunk_size > 0:
        row_limit = (row[:, 0:1] // chunk_size + 1) * chunk_size
        return jnp.minimum(row_limit, length)
    return jnp.full((block_q, 1), length, jnp.int32)


def _n_vis_key_blocks(q_idx, block_q, block_k, t_kv, chunk_size):
    """Number of key blocks any query in block q_idx can see (chunk skip)."""
    num_k_blocks = t_kv // block_k
    if chunk_size > 0:
        max_vis_block = (((q_idx + 1) * block_q - 1) // chunk_size + 1) * chunk_size
        return jnp.minimum(
            pl.cdiv(jnp.minimum(max_vis_block, t_kv), block_k), num_k_blocks
        )
    return num_k_blocks


def _attn_kernel(
    length_ref,  # SMEM (1,)
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, T, D)
    v_ref,  # (1, T, D)
    o_ref,  # (1, BQ, D)
    *maybe_lse,  # optionally (1, 1, BQ) logsumexp output (training forward)
    # (the singleton middle dim satisfies the TPU tiling rule: block last-two
    # dims must divide (8, 128) or equal the array dims — (1, BQ) does not)
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
    max_visible = _max_visible(q_idx, block_q, block_k, length, chunk_size)

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

    n_blocks = _n_vis_key_blocks(q_idx, block_q, block_k, t_kv, chunk_size)

    d = q_ref.shape[-1]
    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if maybe_lse:
        # guard: a fully-masked row has m = l = 0-mass; keep lse finite so the
        # backward's exp(s - lse) stays 0/1-bounded and ds vanishes with do=0
        maybe_lse[0][0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _dq_kernel(
    length_ref,  # SMEM
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, T, D)
    v_ref,  # (1, T, D)
    do_ref,  # (1, BQ, D)
    lse_ref,  # (1, 1, BQ)
    delta_ref,  # (1, 1, BQ)  rowsum(do * o)
    dq_ref,  # (1, BQ, D)
    *,
    block_q: int,
    block_k: int,
    t_kv: int,
    sm_scale: float,
    chunk_size: int,
):
    bh_idx = pl.program_id(0)
    q_idx = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    length = length_ref[bh_idx, 0]
    max_visible = _max_visible(q_idx, block_q, block_k, length, chunk_size)

    def body(kb, acc):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        p = jnp.where(col < max_visible, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    n_blocks = _n_vis_key_blocks(q_idx, block_q, block_k, t_kv, chunk_size)
    d = q_ref.shape[-1]
    acc = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (acc * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    length_ref,  # SMEM
    q_ref,  # (1, T, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    do_ref,  # (1, T, D)
    lse_ref,  # (1, 1, T)
    delta_ref,  # (1, 1, T)
    dk_ref,  # (1, BK, D)
    dv_ref,  # (1, BK, D)
    *,
    block_q: int,
    block_k: int,
    t_kv: int,
    sm_scale: float,
    chunk_size: int,
):
    bh_idx = pl.program_id(0)
    k_idx = pl.program_id(1)
    k_blk = k_ref[0].astype(jnp.float32)  # (BK, D)
    v_blk = v_ref[0].astype(jnp.float32)
    length = length_ref[bh_idx, 0]
    key_abs = k_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, block_q), 0
    )

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32) * sm_scale
        do_blk = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][None, :]
        delta_blk = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][None, :]
        s_t = jax.lax.dot_general(
            k_blk, q_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, BQ) == s^T
        q_abs = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 1
        )
        if chunk_size > 0:
            vis_bound = jnp.minimum((q_abs // chunk_size + 1) * chunk_size, length)
        else:
            vis_bound = jnp.full_like(q_abs, length)
        p_t = jnp.where(key_abs < vis_bound, jnp.exp(s_t - lse_blk), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t, do_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp_t = jax.lax.dot_general(
            v_blk, do_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, BQ)
        ds_t = p_t * (dp_t - delta_blk)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, q_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # q_blk is pre-scaled: dk = ds^T (q * sm_scale)
        return dk_acc, dv_acc

    num_q_blocks = t_kv // block_q
    if chunk_size > 0:
        # queries in chunks before this key block's chunk see none of it
        qb_start = ((k_idx * block_k) // chunk_size) * chunk_size // block_q
    else:
        qb_start = 0
    d = k_ref.shape[-1]
    z = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(qb_start, num_q_blocks, body, (z, z))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_call(qf, kf, vf, lengths_bh, chunk_size, sm_scale, block_q, block_k,
                interpret, with_lse: bool):
    bh, t, d = qf.shape
    kernel = functools.partial(
        _attn_kernel,
        block_q=block_q,
        block_k=block_k,
        t_kv=t,
        sm_scale=sm_scale,
        chunk_size=chunk_size,
    )
    out_shape = [jax.ShapeDtypeStruct((bh, t, d), qf.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0))]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, 1, t), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda i, j, L: (i, 0, j))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
        ],
        out_specs=out_specs if with_lse else out_specs[0],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if with_lse else out_shape[0],
        interpret=interpret,
    )(lengths_bh[:, None], qf, kf, vf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(qf, kf, vf, lengths_bh, chunk_size, sm_scale, block_q, block_k,
           interpret):
    """Differentiable core on flattened (BH, T, D) operands."""
    return _flash_call(qf, kf, vf, lengths_bh, chunk_size, sm_scale, block_q,
                       block_k, interpret, with_lse=False)


def _flash_fwd(qf, kf, vf, lengths_bh, chunk_size, sm_scale, block_q, block_k,
               interpret):
    o, lse = _flash_call(qf, kf, vf, lengths_bh, chunk_size, sm_scale, block_q,
                         block_k, interpret, with_lse=True)
    return o, (qf, kf, vf, lengths_bh, o, lse)


def _flash_bwd(chunk_size, sm_scale, block_q, block_k, interpret, res, do):
    """Standard flash backward (dQ pass + dK/dV pass), mask semantics
    identical to the forward.  delta = rowsum(do * o) is the usual
    softmax-jacobian correction term."""
    qf, kf, vf, lengths_bh, o, lse = res
    bh, t, d = qf.shape
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, None, :]  # (bh, 1, t) — same tiling-friendly layout as lse

    common = dict(block_q=block_q, block_k=block_k, t_kv=t, sm_scale=sm_scale,
                  chunk_size=chunk_size)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0)),
                pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
                pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0)),
                pl.BlockSpec((1, 1, block_q), lambda i, j, L: (i, 0, j)),
                pl.BlockSpec((1, 1, block_q), lambda i, j, L: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, L: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), qf.dtype),
        interpret=interpret,
    )(lengths_bh[:, None], qf, kf, vf, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // block_k),
            in_specs=[
                pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, L: (i, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, L: (i, j, 0)),
                pl.BlockSpec((1, t, d), lambda i, j, L: (i, 0, 0)),
                pl.BlockSpec((1, 1, t), lambda i, j, L: (i, 0, 0)),
                pl.BlockSpec((1, 1, t), lambda i, j, L: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda i, j, L: (i, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, L: (i, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, t, d), vf.dtype),
        ],
        interpret=interpret,
    )(lengths_bh[:, None], qf, kf, vf, do, lse, delta)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


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
    valid keys and their outputs are discarded by the caller's masks.

    Differentiable: a custom VJP (flash backward as two Pallas kernels)
    makes this usable in training — the flow train step no longer pins
    backend="xla" (VERDICT r4 next #4).  Inference-only calls run the primal
    kernel unchanged (no LSE output, same executable as before)."""
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
    out = _flash(qf, kf, vf, lengths_bh, chunk_size, sm_scale, block_q,
                 block_k, interpret)
    return out.reshape(b, h, t, d)


def attention_backend() -> str:
    """'pallas' on real TPU backends, 'xla' elsewhere (tests/CPU)."""
    import os

    override = os.environ.get("COSY_TPU_FLASH")
    if override is not None:
        return "pallas" if override == "1" else "xla"
    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
