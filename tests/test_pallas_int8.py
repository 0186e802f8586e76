"""Pallas int8 weight-only matmul: numerics vs the plain XLA dequant path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.ops.pallas.int8_matmul import int8_matmul
from cosyvoice2_eu_tpu.utils.params import dense, quantize_dense


@pytest.mark.parametrize(
    "m,n,k",
    [
        (1, 896, 896),      # decode-step q/o projection
        (1, 128, 896),      # kv projection (N smaller than the block)
        (4, 4864, 896),     # engine-slot gate/up projection
        (3, 896, 4864),     # down projection, odd M
        (2, 6564, 896),     # speech head: N not a multiple of 128
        (576, 896, 896),    # prefill-sized M (partial last M block)
    ],
)
def test_int8_matmul_matches_xla(m, n, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-127, 128, (n, k)), jnp.int8)
    got = int8_matmul(x, w_q, interpret=True)
    want = x @ w_q.T.astype(jnp.float32)
    # f32 accumulation-order differences on K~=1000 sums of O(100) terms
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-2)


def test_dense_int8_pallas_path_matches_xla_path(monkeypatch):
    """The dense() routing: pallas (forced via interpret through env) and the
    XLA fallback must agree on the quantized layer output."""
    rng = np.random.default_rng(1)
    p = {
        "weight": jnp.asarray(rng.standard_normal((256, 128)), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((256,)), jnp.float32),
    }
    q = quantize_dense(p)
    x = jnp.asarray(rng.standard_normal((2, 5, 128)), jnp.float32)

    monkeypatch.setenv("COSY_TPU_INT8", "0")
    y_xla = dense(q, x)

    # run the kernel in interpret mode directly (CPU has no pallas TPU path)
    y32 = int8_matmul(x.reshape(-1, 128), q["weight_q"], interpret=True)
    y_pl = (y32 * q["scale"]).astype(x.dtype).reshape(2, 5, 256) + q["bias"]

    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_xla), rtol=2e-5, atol=2e-5
    )
    # and both stay close to the unquantized layer
    y_ref = dense(p, x)
    err = np.abs(np.asarray(y_pl) - np.asarray(y_ref)).mean()
    assert err < 0.1


def test_int8_lm_logits_close_to_bf16():
    """End-to-end quality pin: int8 weight-only LM logits must track the
    bf16 logits closely enough that sampling behavior is preserved
    (VERDICT r4 next #5: no parity test pinned int8 vs bf16 quality)."""
    from cosyvoice2_eu_tpu.config import tiny_test_config
    from cosyvoice2_eu_tpu.models import llm as llm_mod
    from cosyvoice2_eu_tpu.utils.params import quantize_lm_params

    cfg = tiny_test_config().llm
    params = llm_mod.init_lm(jax.random.key(0), cfg)
    qparams = quantize_lm_params(params)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 100, (2, 24)), jnp.int32)
    src = jnp.asarray(rng.integers(0, 3, (2, 24)), jnp.int32)
    valid = jnp.ones((2, 24), bool)

    logits = np.asarray(llm_mod.lm_training_hidden(params, cfg, ids, src, valid))
    logits_q = np.asarray(llm_mod.lm_training_hidden(qparams, cfg, ids, src, valid))
    # per-channel symmetric int8 keeps logits within a tight relative band
    scale = np.abs(logits).max()
    assert np.abs(logits_q - logits).max() / scale < 0.05
    # rank agreement: the argmax token survives quantization on ~all steps
    agree = (logits_q.argmax(-1) == logits.argmax(-1)).mean()
    assert agree > 0.9
