"""Tensor-parallel LM decode (parallel/tp.py): the sharded decode must
reproduce the single-device decode and actually distribute the weights.

The reference has no TP outside its optional vLLM engine
(cosy_repo/cosyvoice/vllm/cosyvoice2.py:57-67); these tests pin our
TPU-native GSPMD equivalent on the 8-device simulated mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import tiny_test_config
from cosyvoice2_eu_tpu.models import llm as llm_mod
from cosyvoice2_eu_tpu.parallel.tp import lm_tp_specs, make_tp_mesh, shard_lm_tp

CFG = tiny_test_config().llm


def _prompt(rng):
    ids = rng.integers(2, 100, (1, 16)).astype(np.int32)
    src = rng.integers(0, 2, (1, 16)).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(src), jnp.asarray([13])


def _decode(params, n_steps=24):
    ids, src, plen = _prompt(np.random.default_rng(0))
    tokens, lengths = jax.jit(
        lambda pp, i, s, pl: llm_mod.lm_decode(
            pp, CFG, i, s, pl, jnp.asarray([4]), jnp.asarray([n_steps]),
            jax.random.key(7), n_steps,
        )
    )(params, ids, src, plen)
    return np.asarray(tokens)[0, : int(lengths[0])], int(lengths[0])


def test_tp_specs_layout():
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    specs = lm_tp_specs(params, tp=2)
    layer = specs["backbone"]["layers"][0]
    assert layer["q_proj"]["weight"] == jax.sharding.PartitionSpec("tp", None)
    assert layer["o_proj"]["weight"] == jax.sharding.PartitionSpec(None, "tp")
    assert layer["down_proj"]["weight"] == jax.sharding.PartitionSpec(None, "tp")
    assert specs["llm_decoder"]["weight"] == jax.sharding.PartitionSpec("tp", None)
    assert specs["llm_decoder"]["bias"] == jax.sharding.PartitionSpec("tp")
    # replicated: norms + embeddings
    assert layer["input_layernorm"]["weight"] == jax.sharding.PartitionSpec()
    assert specs["backbone"]["embed_tokens"]["weight"] == jax.sharding.PartitionSpec()


def test_tp_specs_indivisible_fall_back_replicated():
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    # tiny config: num_kv_heads=2, head_dim=16 -> kv out dim 32; tp=64 divides
    # nothing meaningful in k/v, so those shard specs must degrade to P()
    specs = lm_tp_specs(params, tp=64)
    layer = specs["backbone"]["layers"][0]
    assert layer["k_proj"]["weight"] == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_single_device(tp):
    """Same rng, same prompt: the GSPMD-sharded decode yields the same
    tokens as the single-device program (fp32 on CPU; reduction reorder is
    below sampling sensitivity at these sizes)."""
    params = llm_mod.init_lm(jax.random.key(0), CFG)
    ref_tokens, ref_n = _decode(params)
    assert ref_n > 0

    mesh = make_tp_mesh(tp)
    sharded = shard_lm_tp(params, mesh)
    # weights really distributed: a column-parallel leaf is split over tp
    qw = sharded["backbone"]["layers"][0]["q_proj"]["weight"]
    shard_rows = {s.data.shape[0] for s in qw.addressable_shards}
    assert shard_rows == {qw.shape[0] // tp}
    got_tokens, got_n = _decode(sharded)
    assert got_n == ref_n
    np.testing.assert_array_equal(got_tokens, ref_tokens)


def test_tp_int8_rekeys_to_xla_path_and_decodes():
    """load(lm_quant="int8", tp>1): quantized weights must be re-keyed to
    the GSPMD-partitionable XLA dequant path (a pallas_call has no SPMD
    rule) and the sharded int8 decode must match unsharded int8 decode."""
    from cosyvoice2_eu_tpu.utils.params import quantize_lm_params

    params = quantize_lm_params(llm_mod.init_lm(jax.random.key(0), CFG))
    ref_tokens, ref_n = _decode(params)
    assert ref_n > 0

    mesh = make_tp_mesh(2)
    sharded = shard_lm_tp(params, mesh)
    layer = sharded["backbone"]["layers"][0]
    # re-keyed off the pallas path...
    assert "weight_q" not in layer["q_proj"]
    assert layer["q_proj"]["weight_q_xla"].dtype == jnp.int8
    # ...and actually column-sharded over the mesh
    qw = layer["q_proj"]["weight_q_xla"]
    shard_rows = {s.data.shape[0] for s in qw.addressable_shards}
    assert shard_rows == {qw.shape[0] // 2}
    got_tokens, got_n = _decode(sharded)
    assert got_n == ref_n
    np.testing.assert_array_equal(got_tokens, ref_tokens)


def test_tp_prefill_hidden_close():
    """Prefill last-hidden parity under sharding (activation-level check,
    independent of sampling)."""
    params = llm_mod.init_lm(jax.random.key(1), CFG)
    ids, src, plen = _prompt(np.random.default_rng(3))

    def prefill(pp):
        st = jax.jit(
            lambda p, i, s, pl: llm_mod.lm_prefill(p, CFG, i, s, pl,
                                                   jax.random.key(0), 8)
        )(pp, ids, src, plen)
        return np.asarray(st.last_hidden)

    ref = prefill(params)
    got = prefill(shard_lm_tp(params, make_tp_mesh(2)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
