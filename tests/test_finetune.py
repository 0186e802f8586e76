"""LoRA and DPO finetuning paths."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosyvoice2_eu_tpu.config import TrainConfig, tiny_test_config
from cosyvoice2_eu_tpu.models.llm import init_lm
from cosyvoice2_eu_tpu.parallel.train_step import TrainState, init_train_state
from cosyvoice2_eu_tpu.train.dpo import dpo_loss_fn, make_dpo_train_step
from cosyvoice2_eu_tpu.train.lora import apply_lora, init_lora, make_lora_lm_train_step, merge_lora
from cosyvoice2_eu_tpu.train.sequences import build_lm_batch

CFG = tiny_test_config().llm
TRAIN = TrainConfig(lr=1e-3, accum_grad=1)


def _batch(rng, n=2, reject=False):
    texts = [rng.integers(2, 100, 5).astype(np.int32) for _ in range(n)]
    speeches = [rng.integers(0, CFG.speech_token_size, 12).astype(np.int32) for _ in range(n)]
    b = build_lm_batch(texts, speeches, CFG, rng, bistream_prob=0.0, pad_to=32)
    out = {k: jnp.asarray(v) for k, v in b.items()}
    if reject:
        rej = [rng.integers(0, CFG.speech_token_size, 10).astype(np.int32) for _ in range(n)]
        rb = build_lm_batch(texts, rej, CFG, rng, bistream_prob=0.0, pad_to=32)
        out.update({f"reject_{k}": jnp.asarray(v) for k, v in rb.items()})
    return out


def test_lora_identity_at_init_and_updates():
    base = init_lm(jax.random.key(0), CFG)
    lora = init_lora(jax.random.key(1), base, rank=4)
    adapted = apply_lora(base, lora)
    # B = 0 -> adapter starts as identity
    np.testing.assert_array_equal(
        np.asarray(adapted["backbone"]["layers"][0]["q_proj"]["weight"]),
        np.asarray(base["backbone"]["layers"][0]["q_proj"]["weight"]),
    )

    rng = np.random.default_rng(0)
    batch = _batch(rng)
    tx = optax.adam(1e-3)
    step = make_lora_lm_train_step(CFG, TRAIN, tx, base)
    state = init_train_state(lora, tx)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # adapters moved; base untouched
    b0 = np.asarray(state.params["layers"][0]["q_proj"]["B"]) if False else None
    assert not np.allclose(
        np.asarray(state2.params["layers"][0]["q_proj"]["B"]), 0.0
    )
    merged = merge_lora(base, state2.params)
    assert not np.allclose(
        np.asarray(merged["backbone"]["layers"][0]["q_proj"]["weight"]),
        np.asarray(base["backbone"]["layers"][0]["q_proj"]["weight"]),
    )


def test_dpo_step():
    params = init_lm(jax.random.key(0), CFG)
    # independent buffers: ref is a traced argument of the donated step, so
    # aliasing params would be a donation conflict (as in the real train CLI,
    # which also copies)
    ref = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(1)
    batch = _batch(rng, reject=True)
    loss, metrics = dpo_loss_fn(params, ref, CFG, batch)
    assert np.isfinite(float(loss))
    # policy == ref -> rewards are zero
    np.testing.assert_allclose(float(metrics["chosen_reward"]), 0.0, atol=1e-5)

    tx = optax.adam(1e-4)
    step = make_dpo_train_step(CFG, TRAIN, tx, ref)
    state = init_train_state(params, tx)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["dpo"]) > 0
