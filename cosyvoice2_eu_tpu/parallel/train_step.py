"""Sharded training steps (LM / flow).

The jitted step consumes sharded params/opt-state/batch; XLA inserts the
gradient all-reduce over 'dp' (== DDP) and the fsdp-sharded optimizer update
(== ZeRO-2).  GAN (HiFT) training lives in train/gan.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from cosyvoice2_eu_tpu.config import FlowConfig, LMConfig, TrainConfig
from cosyvoice2_eu_tpu.models import llm as llm_mod
from cosyvoice2_eu_tpu.models.encoder import upsample_conformer_forward
from cosyvoice2_eu_tpu.models.estimator import estimator_forward
from cosyvoice2_eu_tpu.ops.masks import make_non_pad_mask
from cosyvoice2_eu_tpu.train.losses import cfm_loss, label_smoothing_ce
from cosyvoice2_eu_tpu.utils.params import dense, embedding


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# speech LM
# ---------------------------------------------------------------------------

def lm_loss_fn(params, cfg: LMConfig, batch, train_cfg: TrainConfig):
    """batch: ids/src/target (B, T) packed sequences + lengths (B,).

    Sequence packing (unistream/bistream interleave) happens in the data
    pipeline (train/dataset.py build_lm_sequences), mirroring
    prepare_lm_input_target (reference llm.py:437-477).
    """
    valid = make_non_pad_mask(batch["lengths"], batch["ids"].shape[1])
    logits = llm_mod.lm_training_hidden(params, cfg, batch["ids"], batch["src"], valid)
    loss, acc = label_smoothing_ce(
        logits, batch["target"], smoothing=cfg.lsm_weight,
        normalize_length=cfg.length_normalized_loss,
    )
    return loss, {"loss": loss, "acc": acc}


def make_lm_train_step(cfg: LMConfig, train_cfg: TrainConfig, tx: optax.GradientTransformation):
    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: lm_loss_fn(p, cfg, batch, train_cfg), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# flow (CFM)
# ---------------------------------------------------------------------------

def flow_loss_fn(params, cfg: FlowConfig, batch, rng, streaming: bool):
    """batch: speech_token (B, T_tok), speech_token_len, speech_feat
    (B, T_mel, 80), speech_feat_len, embedding (B, 192).

    Mirrors CausalMaskedDiffWithXvec.forward (reference flow.py:189-233):
    unified streaming/non-streaming training, random prompt conditioning.
    """
    token = batch["speech_token"]
    token_len = batch["speech_token_len"]
    feat = batch["speech_feat"]
    feat_len = batch["speech_feat_len"]
    b, t_tok = token.shape
    t_mel = feat.shape[1]

    k_cond, k_frac, k_cfm = jax.random.split(rng, 3)

    spk = batch["embedding"]
    spk = spk / jnp.maximum(jnp.linalg.norm(spk, axis=1, keepdims=True), 1e-12)
    spk = dense(params["spk_embed_affine_layer"], spk)

    tok_mask = make_non_pad_mask(token_len, t_tok)[..., None].astype(feat.dtype)
    h_tok = embedding(params["input_embedding"], jnp.maximum(token, 0)) * tok_mask
    h, h_lens = upsample_conformer_forward(
        params["encoder"], cfg.encoder, h_tok, token_len, streaming=streaming
    )
    h = dense(params["encoder_proj"], h)  # (B, T_mel', 80)
    # trim/pad to the target mel length
    if h.shape[1] > t_mel:
        h = h[:, :t_mel]
    elif h.shape[1] < t_mel:
        h = jnp.pad(h, ((0, 0), (0, t_mel - h.shape[1]), (0, 0)))

    # random prompt conditioning: 50% of rows expose a random prefix (0-30%)
    use_cond = jax.random.uniform(k_cond, (b,)) < 0.5
    frac = jax.random.uniform(k_frac, (b,)) * 0.3
    cond_len = (frac * feat_len.astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.arange(t_mel)[None, :]
    cond_mask = (idx < cond_len[:, None]) & use_cond[:, None]
    conds = jnp.where(cond_mask[..., None], feat, 0.0).transpose(0, 2, 1)

    mask = make_non_pad_mask(feat_len, t_mel)[:, None].astype(feat.dtype)

    def est_fn(y, m, mu, t, s, c):
        # backend=None (auto): the flash kernel carries a custom VJP (Pallas
        # backward kernels, ops/pallas/flash_attention.py), so training runs
        # flash on TPU too; CPU tests auto-fall back to the XLA path
        return estimator_forward(
            params["estimator"], cfg.estimator, y, m, mu, t, s, c,
            streaming=streaming,
        )

    loss = cfm_loss(
        est_fn,
        feat.transpose(0, 2, 1),
        mask,
        h.transpose(0, 2, 1) * mask,
        spk,
        conds,
        k_cfm,
        sigma_min=cfg.cfm.sigma_min,
        training_cfg_rate=cfg.cfm.training_cfg_rate,
        t_scheduler=cfg.cfm.t_scheduler,
    )
    return loss, {"loss": loss}


def make_flow_train_step(cfg: FlowConfig, train_cfg: TrainConfig, tx: optax.GradientTransformation):
    @partial(jax.jit, static_argnames=("streaming",), donate_argnums=(0,))
    def step(state: TrainState, batch, rng, streaming: bool = False):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: flow_loss_fn(p, cfg, batch, rng, streaming), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
