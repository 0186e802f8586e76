"""Training losses.

* Label-smoothing CE + accuracy for the speech LM
  (reference: cosy_repo/cosyvoice/transformer/label_smoothing_loss.py:21,
  cosy_repo/cosyvoice/utils/common.py:78).
* OT conditional flow-matching loss with CFG dropout
  (reference: cosy_repo/cosyvoice/flow/flow_matching.py:152-191).
* DPO loss for preference finetuning (reference: cosy_repo/cosyvoice/utils/losses.py:43).
* GAN auxiliary losses (TPR / multi-mel) live in train/gan.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def label_smoothing_ce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.0,
    normalize_length: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V) logits vs (B, T) targets with IGNORE_ID padding.

    Returns (loss, accuracy).  KL-style smoothing: true class gets
    (1 - smoothing), the rest share smoothing/(V-1) — matching the reference's
    LabelSmoothingLoss numerics.
    """
    v = logits.shape[-1]
    mask = targets != IGNORE_ID
    safe_t = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    confidence = 1.0 - smoothing
    other = smoothing / (v - 1)
    true_logp = jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    if smoothing > 0.0:
        kl = -(other * jnp.sum(logp, axis=-1) + (confidence - other) * true_logp)
    else:
        kl = -true_logp
    kl = jnp.where(mask, kl, 0.0)

    denom = jnp.maximum(jnp.sum(mask), 1) if normalize_length else jnp.maximum(
        jnp.sum(jnp.any(mask, axis=-1)), 1
    )
    loss = jnp.sum(kl) / denom

    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == targets) & mask) / jnp.maximum(jnp.sum(mask), 1)
    return loss, acc


def cfm_loss(
    estimator_fn,
    x1: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    spks: jnp.ndarray,
    cond: jnp.ndarray,
    rng: jax.Array,
    sigma_min: float = 1e-6,
    training_cfg_rate: float = 0.2,
    t_scheduler: str = "cosine",
) -> jnp.ndarray:
    """OT-CFM loss: y_t = (1-(1-sigma)t) z + t x1, target u = x1 - (1-sigma) z.

    estimator_fn(y, mask, mu, t, spks, cond) -> velocity prediction.
    """
    b, c, _ = x1.shape
    k_t, k_z, k_cfg = jax.random.split(rng, 3)
    t = jax.random.uniform(k_t, (b, 1, 1), x1.dtype)
    if t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    z = jax.random.normal(k_z, x1.shape, x1.dtype)

    y = (1.0 - (1.0 - sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - sigma_min) * z

    if training_cfg_rate > 0:
        keep = jax.random.uniform(k_cfg, (b,)) > training_cfg_rate
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    pred = estimator_fn(y, mask, mu, t[:, 0, 0], spks, cond)
    sq = jnp.square(pred * mask - u * mask)
    return jnp.sum(sq) / (jnp.maximum(jnp.sum(mask), 1.0) * c)


def dpo_loss(
    chosen_logps: jnp.ndarray,
    rejected_logps: jnp.ndarray,
    ref_chosen_logps: jnp.ndarray,
    ref_rejected_logps: jnp.ndarray,
    beta: float = 0.01,
    label_smoothing: float = 0.0,
):
    """Sigmoid DPO (reference utils/losses.py:43)."""
    ratio = (chosen_logps - rejected_logps) - (ref_chosen_logps - ref_rejected_logps)
    losses = (
        -jax.nn.log_sigmoid(beta * ratio) * (1 - label_smoothing)
        - jax.nn.log_sigmoid(-beta * ratio) * label_smoothing
    )
    chosen_rewards = beta * (chosen_logps - ref_chosen_logps)
    rejected_rewards = beta * (rejected_logps - ref_rejected_logps)
    return losses.mean(), chosen_rewards.mean(), rejected_rewards.mean()
