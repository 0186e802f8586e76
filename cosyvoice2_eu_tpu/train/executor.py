"""Training executor: epoch loop, cross-validation, checkpoint management.

Re-expression of the reference Executor + train_utils persistence
(reference: cosy_repo/cosyvoice/utils/executor.py:26-176,
cosy_repo/cosyvoice/utils/train_utils.py:206-246 save_model,
cosy_repo/cosyvoice/bin/train.py:420-473 resume,
cosy_repo/cosyvoice/bin/average_model.py:44-75 top-N averaging).

Checkpoints are orbax pytrees + a YAML-ish info sidecar carrying step/epoch/
loss, which resume and best-N selection read back.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from cosyvoice2_eu_tpu.config import TrainConfig
from cosyvoice2_eu_tpu.runtime.checkpoint import load_pytree, save_pytree


def save_checkpoint(model_dir: str, tag: str, params, info: dict, opt_state=None) -> str:
    """Persist params (+ optionally optimizer state) with a JSON sidecar.

    Mirrors the reference's save_model (train_utils.py:206-246): the sidecar
    carries step/epoch/cv_loss for resume and best-N selection.  Unlike
    round 1, the optimizer state (Adam moments + schedule count) is saved too
    so resume continues the exact loss/LR trajectory (bin/train.py:420-473).
    """
    path = os.path.join(model_dir, tag)
    save_pytree(path, jax.device_get(params))
    if opt_state is not None:
        save_pytree(path + "-opt", jax.device_get(opt_state))
    with open(path + ".json", "w") as f:
        json.dump(
            dict(
                info,
                tag=tag,
                has_opt=opt_state is not None,
                save_time=time.strftime("%d/%m/%Y %H:%M:%S"),
            ),
            f,
            indent=2,
        )
    return path


def restore_train_state(model_dir: str, info: dict, state):
    """Rebuild a TrainState from a checkpoint, preserving shardings.

    `state` is a freshly-initialized (already sharded) TrainState used as the
    structure/sharding template.  Restores params, optimizer state (when the
    checkpoint has one; Adam moments and the schedule's internal count resume
    exactly), and the step counter (reference bin/train.py:420-473 restores
    step/epoch into the scheduler).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    path = os.path.join(model_dir, info["tag"])

    # mesh for replicating leaves whose template placement is a bare default
    # device (e.g. tx.init scalars): a committed single-device array would
    # conflict with mesh-sharded params inside the jitted step
    mesh = next(
        (
            leaf.sharding.mesh
            for leaf in jax.tree.leaves(state.params)
            if isinstance(getattr(leaf, "sharding", None), NamedSharding)
        ),
        None,
    )

    def _put(t, r):
        r = jnp.asarray(r, getattr(t, "dtype", None))
        if isinstance(getattr(t, "sharding", None), NamedSharding):
            return jax.device_put(r, t.sharding)
        if mesh is not None:
            return jax.device_put(r, NamedSharding(mesh, PartitionSpec()))
        return r

    def _replace(template, restored):
        return jax.tree.map(_put, template, restored)

    params = _replace(state.params, load_pytree(path, jax.device_get(state.params)))
    opt_state = state.opt_state
    if info.get("has_opt"):
        opt_state = _replace(
            state.opt_state, load_pytree(path + "-opt", jax.device_get(state.opt_state))
        )
    step = jnp.asarray(info.get("step", 0), jnp.int32)
    return type(state)(params, opt_state, step)


def list_checkpoints(model_dir: str) -> list[dict]:
    out = []
    for name in os.listdir(model_dir) if os.path.isdir(model_dir) else []:
        if name.endswith(".json"):
            with open(os.path.join(model_dir, name)) as f:
                out.append(json.load(f))
    return out


def latest_checkpoint(model_dir: str) -> Optional[dict]:
    """Resume picker: newest checkpoint by save order (bin/train.py:420-455)."""
    infos = list_checkpoints(model_dir)
    if not infos:
        return None
    return max(infos, key=lambda i: (i.get("epoch", -1), i.get("step", -1)))


def average_checkpoints(model_dir: str, like, num: int = 5, metric: str = "cv_loss"):
    """Average the top-N checkpoints by CV loss (average_model.py:44-75)."""
    infos = [i for i in list_checkpoints(model_dir) if metric in i]
    infos.sort(key=lambda i: i[metric])
    chosen = infos[:num]
    assert chosen, f"no checkpoints with {metric} in {model_dir}"
    acc = None
    for info in chosen:
        tree = load_pytree(os.path.join(model_dir, info["tag"]), like)
        if acc is None:
            acc = jax.tree.map(lambda a: np.asarray(a, np.float64), tree)
        else:
            acc = jax.tree.map(lambda a, b: a + np.asarray(b, np.float64), acc, tree)
    n = len(chosen)
    return jax.tree.map(lambda a: (a / n).astype(np.float32), acc), [i["tag"] for i in chosen]


class Executor:
    """Epoch loop with grad accumulation, periodic CV + step checkpoints."""

    def __init__(
        self,
        train_cfg: TrainConfig,
        step_fn: Callable,
        cv_fn: Optional[Callable] = None,
        model_dir: str = "exp",
        log_fn: Optional[Callable[[dict], None]] = None,
    ):
        self.cfg = train_cfg
        self.step_fn = step_fn
        self.cv_fn = cv_fn
        self.model_dir = model_dir
        self.log_fn = log_fn or (lambda m: None)
        self.step = 0
        self.epoch = 0
        self.on_step: Callable[[int], None] = lambda step: None  # watchdog hook
        os.makedirs(model_dir, exist_ok=True)

    def cross_validate(self, state, cv_batches) -> float:
        """Utterance-weighted CV loss (executor.py:146-176).

        cv_batches may be a re-iterable, or a zero-arg factory returning a
        fresh iterator — REQUIRED when CV runs more than once per epoch
        (save_per_step + epoch end), since a bare generator would be
        exhausted after the first pass and silently report cv_loss=0."""
        batches = cv_batches() if callable(cv_batches) else cv_batches
        total, weight = 0.0, 0
        for batch in batches:
            metrics = self.cv_fn(state.params, batch)
            n = int(next(iter(batch.values())).shape[0])
            total += float(metrics["loss"]) * n
            weight += n
        return total / max(weight, 1)

    def train_epoch(self, state, train_batches: Iterable[dict], cv_batches=None):
        cfg = self.cfg
        for batch in train_batches:
            state, metrics = self.step_fn(state, batch)
            self.step += 1
            self.on_step(self.step)
            if self.step % cfg.log_interval == 0:
                log = {k: float(v) for k, v in metrics.items()}
                log.update(step=self.step, epoch=self.epoch)
                logging.info("TRAIN %s", log)
                self.log_fn(log)
            if (
                cfg.save_per_step > 0
                and self.step % cfg.save_per_step == 0
                and cv_batches is not None
            ):
                cv_loss = self.cross_validate(state, cv_batches)
                tag = f"epoch_{self.epoch}_step_{self.step}"
                save_checkpoint(
                    self.model_dir, tag, state.params,
                    {"epoch": self.epoch, "step": self.step, "cv_loss": cv_loss},
                    opt_state=state.opt_state,
                )
                logging.info("saved %s cv_loss=%.4f", tag, cv_loss)
        # end of epoch
        info = {"epoch": self.epoch, "step": self.step}
        if cv_batches is not None:
            info["cv_loss"] = self.cross_validate(state, cv_batches)
        save_checkpoint(
            self.model_dir, f"epoch_{self.epoch}_whole", state.params, info,
            opt_state=state.opt_state,
        )
        self.epoch += 1
        return state
