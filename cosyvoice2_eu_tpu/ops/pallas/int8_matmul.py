"""Int8 weight-only matmul with the dequantize fused into the kernel (Pallas TPU).

The speech-LM decode is HBM-bandwidth-bound: every generated token streams the
whole projection weight set once (reference serves this through vLLM's
quantized kernels, cosy_repo/cosyvoice/vllm/cosyvoice2.py:29).  The XLA lowering
of ``x @ w_q.T.astype(bf16)`` materializes the dequantized bf16 weights through
HBM on TPU (int8 read + bf16 write + bf16 dot read ~= 2.5x the bf16 bytes), so
weight-only int8 saw only ~15% of its theoretical 2x.  This kernel reads the
int8 weights from HBM exactly once and converts in VMEM registers on the way
into the MXU; by the bytes-moved arithmetic that halves per-token weight
traffic (see BENCH_r05 lm_ms_per_token_int8 for the measured on-chip ratio —
r4's 12% number was distorted by a fixed per-call KV fetch in the harness).

y = x @ w_q.T   (the per-output-channel scale / bias are applied by the caller
on the tiny (M, N) result, where they fuse into one elementwise op).

Shapes: x (M, K) float, w_q (N, K) int8 -> (M, N) float32.
K must be lane-aligned (multiple of 128) — all quantized LM projections are
(896 / 4864 in, 128..6564 out).  M and N need not divide the block sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, o_ref):
    # w dequantizes in VMEM: int8 HBM read only.  Integers |w| <= 127 are
    # exactly representable in bf16 (8 mantissa bits cover 2^8), so the
    # convert is lossless and the MXU runs its native bf16 path.
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)  # (BN, K)
    o_ref[...] = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (M, K) float, w_q (N, K) int8 -> (M, N) float32 (unscaled)."""
    m, k = x.shape
    n, k2 = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    assert k % 128 == 0, f"K={k} must be lane-aligned (multiple of 128)"
    # sublane-align the M block so tiny decode batches (M=1) stay legal
    bm = min(block_m, max(16, ((m + 15) // 16) * 16))
    bn = min(block_n, n)
    if m < bm:
        x = jnp.pad(x, ((0, bm - m), (0, 0)))
    grid = (pl.cdiv(x.shape[0], bm), pl.cdiv(n, bn))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, k), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.float32),
        interpret=interpret,
    )(x, w_q)
    return out[:m]


def int8_backend() -> str:
    """'pallas' only where the Pallas TPU lowering is known-supported
    (default_backend() == 'tpu'); 'xla' everywhere else — CPU/GPU tests and
    experimental platforms alike.  Override with COSY_TPU_INT8=0/1."""
    import os

    override = os.environ.get("COSY_TPU_INT8")
    if override is not None:
        return "pallas" if override == "1" else "xla"
    return "pallas" if jax.default_backend() == "tpu" else "xla"
