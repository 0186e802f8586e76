"""DPO preference finetuning for the speech LM.

Mirrors Qwen2LM.forward_dpo (reference: cosy_repo/cosyvoice/llm/llm.py:521-573)
+ DPOLoss (utils/losses.py:43): chosen/rejected sequences share the text
prompt; per-sequence mean log-probs feed the sigmoid DPO objective against a
frozen reference policy, combined with the CE loss on the chosen sequence
(train_utils.py:290-328 batch_forward dpo combine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cosyvoice2_eu_tpu.config import LMConfig, TrainConfig
from cosyvoice2_eu_tpu.models.llm import lm_training_hidden
from cosyvoice2_eu_tpu.ops.masks import make_non_pad_mask
from cosyvoice2_eu_tpu.parallel.train_step import TrainState
from cosyvoice2_eu_tpu.train.losses import IGNORE_ID, dpo_loss, label_smoothing_ce


def _sequence_logps(logits, target):
    """Mean log-prob over NON-ignored target positions... matching the
    reference's (buggy but load-bearing) masking: it averages token logps
    weighted by the IGNORE mask of the *chosen* row (llm.py:569-572).  We use
    the standard formulation: mean over supervised positions."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = target != IGNORE_ID
    safe = jnp.where(mask, target, 0)
    tok_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_logp * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)


def dpo_loss_fn(params, ref_params, cfg: LMConfig, batch, beta: float = 0.01):
    """batch carries packed chosen and rejected sequences:
    ids/src/target/lengths and reject_ids/reject_src/reject_target/
    reject_lengths (built by train/sequences.py from speech_token +
    reject_speech_token columns, processor.py dpo padding)."""
    ids = jnp.concatenate([batch["ids"], batch["reject_ids"]], axis=0)
    src = jnp.concatenate([batch["src"], batch["reject_src"]], axis=0)
    target = jnp.concatenate([batch["target"], batch["reject_target"]], axis=0)
    lengths = jnp.concatenate([batch["lengths"], batch["reject_lengths"]], axis=0)
    b = batch["ids"].shape[0]

    valid = make_non_pad_mask(lengths, ids.shape[1])
    logits = lm_training_hidden(params, cfg, ids, src, valid)
    ref_logits = jax.lax.stop_gradient(
        lm_training_hidden(ref_params, cfg, ids, src, valid)
    )

    ce, acc = label_smoothing_ce(logits[:b], target[:b], smoothing=cfg.lsm_weight,
                                 normalize_length=cfg.length_normalized_loss)
    logps = _sequence_logps(logits, target)
    ref_logps = _sequence_logps(ref_logits, target)
    pref, chosen_r, rejected_r = dpo_loss(
        logps[:b], logps[b:], ref_logps[:b], ref_logps[b:], beta=beta
    )
    loss = ce + pref
    return loss, {
        "loss": loss, "ce": ce, "acc": acc, "dpo": pref,
        "chosen_reward": chosen_r, "rejected_reward": rejected_r,
    }


def make_dpo_train_step(cfg: LMConfig, train_cfg: TrainConfig, tx, ref_params, beta=0.01):
    # ref_params are a traced ARGUMENT, not a closure: closed-over params
    # inline as HLO constants (gigabytes in the compile request at full size).
    # They must NOT alias state.params (donated) — pass jnp.copy'd buffers,
    # as the train CLI does.
    def step(state: TrainState, batch, ref):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: dpo_loss_fn(p, ref, cfg, batch, beta), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    jitted = jax.jit(step, donate_argnums=(0,))
    return lambda state, batch: jitted(state, batch, ref_params)
