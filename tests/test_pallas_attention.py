"""Pallas flash attention (interpret mode) vs masked-softmax reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.ops.masks import chunk_attention_mask
from cosyvoice2_eu_tpu.ops.pallas.flash_attention import flash_attention


def _reference(q, k, v, lengths, chunk):
    b, h, t, d = q.shape
    mask = chunk_attention_mask(lengths, t, chunk)
    bias = jnp.where(mask, 0.0, -1e30)[:, None]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d) + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("chunk,lengths", [(0, [256, 160]), (64, [256, 100])])
def test_flash_matches_reference(chunk, lengths):
    rng = np.random.default_rng(0)
    B, H, T, D = 2, 3, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    L = jnp.asarray(lengths)

    got = flash_attention(q, k, v, L, chunk_size=chunk, block_q=128, block_k=128,
                          interpret=True)
    want = _reference(q, k, v, L, chunk)
    # compare only valid query rows (pad-row outputs are discarded downstream)
    for b in range(B):
        n = lengths[b]
        np.testing.assert_allclose(
            np.asarray(got)[b, :, :n], np.asarray(want)[b, :, :n], atol=2e-5, rtol=1e-4
        )


def test_flash_t384_block_autofit():
    """T=384 with the default 256 block must shrink to 128, not assert
    (bench r4 train-flow regression: mel frames = 192 tokens * 2)."""
    rng = np.random.default_rng(2)
    B, H, T, D = 1, 2, 384, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.3)
    L = jnp.asarray([300])
    got = flash_attention(q, k, v, L, chunk_size=0, interpret=True)
    want = _reference(q, k, v, L, 0)
    np.testing.assert_allclose(
        np.asarray(got)[0, :, :300], np.asarray(want)[0, :, :300],
        atol=2e-5, rtol=1e-4)


def test_fit_block():
    from cosyvoice2_eu_tpu.ops.pallas.flash_attention import _fit_block

    assert _fit_block(256, 384) == 128
    assert _fit_block(256, 512) == 256
    assert _fit_block(256, 128) == 128
    assert _fit_block(256, 64) == 64
    assert _fit_block(128, 640) == 128
    assert _fit_block(256, 640) == 128
    with pytest.raises(ValueError):
        _fit_block(256, 384 + 8)


def test_flash_small_chunks_block_skip():
    """chunk smaller than block: visibility boundary inside a block."""
    rng = np.random.default_rng(1)
    B, H, T, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.3)
    L = jnp.asarray([256])
    got = flash_attention(q, k, v, L, chunk_size=50, block_q=128, block_k=128,
                          interpret=True)
    want = _reference(q, k, v, L, 50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("chunk,lengths", [(0, [256, 160]), (64, [256, 100])])
def test_flash_vjp_matches_reference_grads(chunk, lengths):
    """The custom flash VJP (Pallas backward kernels) must match autodiff
    through the masked-softmax reference for dQ/dK/dV."""
    rng = np.random.default_rng(5)
    B, H, T, D = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    L = jnp.asarray(lengths)
    # scalar loss reads only valid query rows (pad-row outputs are masked
    # downstream in the estimator, so their cotangents are zero)
    w = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    row_ok = (jnp.arange(T)[None, :] < L[:, None])[:, None, :, None]
    w = w * row_ok

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, L, chunk_size=chunk, block_q=128,
                            block_k=128, interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, L, chunk) * w)

    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name}")


def test_flash_vjp_value_unchanged_under_grad():
    """value_and_grad's primal must equal the inference-path forward."""
    rng = np.random.default_rng(6)
    B, H, T, D = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32) * 0.5)
    L = jnp.asarray([100])

    fwd = flash_attention(q, k, v, L, chunk_size=0, interpret=True)
    val, _ = jax.value_and_grad(
        lambda q: jnp.sum(
            flash_attention(q, k, v, L, chunk_size=0, interpret=True) ** 2
        )
    )(q)
    np.testing.assert_allclose(
        float(val), float(jnp.sum(fwd**2)), rtol=1e-5)
