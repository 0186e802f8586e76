"""Optimizers and LR schedulers.

Reference: cosy_repo/cosyvoice/utils/train_utils.py:122 (adam/adamw) and
cosy_repo/cosyvoice/utils/scheduler.py (WarmupLR / ConstantLR / NoamHold).
All schedules expose set-step resume semantics via optax inject_hyperparams.
"""

from __future__ import annotations

import optax

from cosyvoice2_eu_tpu.config import TrainConfig


def warmup_lr(lr: float, warmup_steps: int):
    """WarmupLR (scheduler.py:27): lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5)."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return sched


def constant_lr(lr: float, warmup_steps: int = 0):
    def sched(step):
        return lr

    return sched


def make_schedule(cfg: TrainConfig):
    if cfg.scheduler == "warmuplr":
        return warmup_lr(cfg.lr, cfg.warmup_steps)
    if cfg.scheduler == "constantlr":
        return constant_lr(cfg.lr)
    if cfg.scheduler == "noamhold":
        return noam_hold_annealing(cfg.lr, cfg.warmup_steps)
    raise ValueError(f"unknown scheduler {cfg.scheduler}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Optimizer chain: clip-by-global-norm(5) -> adam/adamw -> schedule.

    Non-finite grads skip the step (reference train_utils.py:353-367) via
    optax.apply_if_finite.
    """
    sched = make_schedule(cfg)
    if cfg.optim == "adamw":
        base = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optim == "adam":
        base = optax.adam(sched)
    else:
        raise ValueError(f"unknown optimizer {cfg.optim}")
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), base)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100000)
    if cfg.accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_grad)
    return tx


def noam_hold_annealing(
    lr: float,
    warmup_steps: int,
    hold_steps: int = 0,
    decay_rate: float = 0.5,
    min_lr: float = 0.0,
):
    """NoamHoldAnnealing (reference scheduler.py:623, NeMo-derived): Noam
    warmup, optional hold plateau, then polynomial annealing to min_lr."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warm = lr * s / warmup_steps
        hold_end = warmup_steps + hold_steps
        decay = lr * ((hold_end / jnp.maximum(s, hold_end)) ** decay_rate)
        out = jnp.where(s <= warmup_steps, warm, jnp.where(s <= hold_end, lr, decay))
        return jnp.maximum(out, min_lr)

    return sched
