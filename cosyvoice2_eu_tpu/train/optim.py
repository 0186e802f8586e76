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
    if cfg.scheduler == "noamannealing":
        return noam_annealing(cfg.lr, cfg.sched_d_model, cfg.warmup_steps,
                              min_lr=cfg.min_lr)
    if cfg.scheduler == "cosineannealing":
        return cosine_annealing(cfg.lr, cfg.max_steps, cfg.warmup_steps,
                                constant_steps=cfg.constant_steps,
                                min_lr=cfg.min_lr)
    if cfg.scheduler == "squareannealing":
        return square_annealing(cfg.lr, cfg.max_steps, cfg.warmup_steps,
                                min_lr=max(cfg.min_lr, 1e-5))
    if cfg.scheduler == "squarerootannealing":
        return squareroot_annealing(cfg.lr, cfg.max_steps, cfg.warmup_steps,
                                    min_lr=cfg.min_lr)
    if cfg.scheduler == "squarerootconstant":
        return squareroot_constant(cfg.lr, cfg.max_steps, cfg.constant_steps,
                                   min_lr=cfg.min_lr)
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


# ---------------------------------------------------------------------------
# NeMo-derived annealing family (reference scheduler.py:74-718).  The torch
# classes index by `last_epoch` (0-based step counter, incremented before the
# LR is read); these schedules take the same integer and reproduce the torch
# trajectories value-for-value (pinned in tests/test_train.py).
# ---------------------------------------------------------------------------


def noam_annealing(lr: float, d_model: int, warmup_steps: int,
                   min_lr: float = 0.0):
    """NoamAnnealing (scheduler.py:558): d_model^-0.5 scaled Noam curve;
    min_lr floor applies only past warmup."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        if warmup_steps > 0:
            mult = jnp.minimum(s**-0.5, s * warmup_steps**-1.5)
        else:
            mult = s**-0.5
        out = lr * d_model**-0.5 * mult
        return jnp.where(s > warmup_steps, jnp.maximum(out, min_lr), out)

    return sched


def cosine_annealing(lr: float, max_steps: int, warmup_steps: int = 0,
                     constant_steps: int = 0, min_lr: float = 0.0):
    """CosineAnnealing (scheduler.py:497).  With constant_steps == 0:
    (step+1)/(warmup+1) linear warmup then half-cosine to min_lr over
    max_steps.  With constant_steps > 0: the Megatron variant — linear
    warmup step/warmup, cosine over decay_steps, then hold at min_lr."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32)
        if constant_steps == 0:
            warm = lr * (s + 1.0) / (warmup_steps + 1.0)
            frac = (s - warmup_steps) / max(max_steps - warmup_steps, 1)
            ann = (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac)) + min_lr
            out = jnp.where(
                (s <= warmup_steps) & (warmup_steps > 0), warm, ann
            )
            return jnp.where(s > max_steps, min_lr, out)
        decay_steps = max_steps - (constant_steps + warmup_steps)
        warm = lr * s / max(warmup_steps, 1)
        ratio = jnp.clip((s - warmup_steps) / max(decay_steps, 1), 0.0, 1.0)
        coeff = 0.5 * (jnp.cos(jnp.pi * ratio) + 1.0)
        ann = min_lr + coeff * (lr - min_lr)
        out = jnp.where((s <= warmup_steps) & (warmup_steps > 0), warm, ann)
        return jnp.where(s > warmup_steps + decay_steps, min_lr, out)

    return sched


def square_annealing(lr: float, max_steps: int, warmup_steps: int = 0,
                     min_lr: float = 1e-5):
    """SquareAnnealing (scheduler.py:444): ((max-s)/max)^2 decay past warmup
    (both shifted by warmup_steps), floored at min_lr."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32)
        warm = lr * (s + 1.0) / (warmup_steps + 1.0)
        span = max(max_steps - warmup_steps, 1)
        mult = ((max_steps - warmup_steps) - (s - warmup_steps)) / span
        ann = jnp.maximum(lr * mult**2, min_lr)
        out = jnp.where((s <= warmup_steps) & (warmup_steps > 0), warm, ann)
        return jnp.where(s > max_steps, min_lr, out)

    return sched


def squareroot_annealing(lr: float, max_steps: int, warmup_steps: int = 0,
                         min_lr: float = 0.0):
    """SquareRootAnnealing (scheduler.py:471): ((max-s)/max)^0.5 over the
    UNshifted step (matching the reference), floored at min_lr."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32)
        warm = lr * (s + 1.0) / (warmup_steps + 1.0)
        mult = jnp.clip((max_steps - s) / max_steps, 0.0, None)
        ann = jnp.maximum(lr * jnp.sqrt(mult), min_lr)
        out = jnp.where((s <= warmup_steps) & (warmup_steps > 0), warm, ann)
        return jnp.where(s > max_steps, min_lr, out)

    return sched


def squareroot_constant(lr: float, max_steps: int, constant_steps: int,
                        min_lr: float = 0.0):
    """SquareRootConstantPolicy (scheduler.py:137): 1/sqrt(constant_steps)
    (an absolute LR, NOT scaled by base lr — reference semantics) up to
    constant_steps, base lr to max_steps, then min_lr."""

    def sched(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32)
        const = constant_steps**-0.5 if constant_steps > 0 else lr
        out = jnp.where(s <= constant_steps, const, lr)
        return jnp.where(s > max_steps, min_lr, out)

    return sched
