"""LoRA finetuning for the speech LM.

Replaces the reference's peft-based LoRA path (reference:
cosy_repo/cosyvoice/bin/train.py:389-406 injection, :513-592 per-epoch adapter
snapshot + merged export).  Adapters attach to the backbone's attention and
MLP projections; training materializes ``base + (alpha/r) * B @ A``
functionally inside the loss, so gradients flow only through A/B while the
frozen base stays untouched.  ``merge_lora`` produces a plain parameter tree
(the reference's "CosyVoice2-compatible merged checkpoint").
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import LMConfig

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def init_lora(
    rng,
    base_params: dict,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> dict:
    """A ~ N(0, 0.01), B = 0 (standard LoRA init: adapter starts as identity)."""
    layers = []
    for i, lp in enumerate(base_params["backbone"]["layers"]):
        entry = {}
        for name in targets:
            if name not in lp:
                continue
            out_dim, in_dim = lp[name]["weight"].shape
            k = jax.random.fold_in(rng, i * 131 + hash(name) % 1000)
            entry[name] = {
                "A": jax.random.normal(k, (rank, in_dim)) * 0.01,
                "B": jnp.zeros((out_dim, rank)),
            }
        layers.append(entry)
    return {"layers": layers}


def apply_lora(base_params: dict, lora: dict, alpha: float = 16.0) -> dict:
    """Return params with adapted weights; base leaves are gradient-stopped."""
    rank = lora["layers"][0][next(iter(lora["layers"][0]))]["A"].shape[0]
    scale = alpha / rank
    frozen = jax.tree.map(jax.lax.stop_gradient, base_params)
    layers = []
    for lp, ad in zip(frozen["backbone"]["layers"], lora["layers"]):
        new_lp = dict(lp)
        for name, w in ad.items():
            delta = (w["B"] @ w["A"]) * scale
            new_lp[name] = dict(lp[name], weight=lp[name]["weight"] + delta.astype(lp[name]["weight"].dtype))
        layers.append(new_lp)
    out = dict(frozen)
    out["backbone"] = dict(frozen["backbone"], layers=layers)
    return out


def merge_lora(base_params: dict, lora: dict, alpha: float = 16.0) -> dict:
    """Fold adapters into a plain checkpoint (train.py:513-592 export)."""
    merged = jax.device_get(apply_lora(base_params, lora, alpha))
    return jax.tree.map(lambda a: a, merged)


def make_lora_lm_train_step(cfg: LMConfig, train_cfg, tx, base_params, alpha: float = 16.0):
    """Train step optimizing only the adapters."""
    import optax

    from cosyvoice2_eu_tpu.parallel.train_step import TrainState, lm_loss_fn

    # base_params are a traced ARGUMENT, not a closure (HLO-constant blowup)
    def step(state: TrainState, batch, base):
        def loss_fn(lora):
            params = apply_lora(base, lora, alpha)
            return lm_loss_fn(params, cfg, batch, train_cfg)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(lora, opt_state, state.step + 1), metrics

    jitted = jax.jit(step, donate_argnums=(0,))
    return lambda state, batch: jitted(state, batch, base_params)
