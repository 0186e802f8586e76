"""v1 flow: MaskedDiffWithXvec — token -> mel via length regulation.

Reference: cosy_repo/cosyvoice/flow/flow.py:24 (MaskedDiffWithXvec) +
flow_matching.py:21 (ConditionalCFM).  Structural contrast with the v2 flow
(models/flow.py): tokens pass 1:1 through a plain (non-upsampling) conformer
encoder; an InterpolateRegulator linearly stretches the encoded sequence to
the 22.05 kHz/256-hop mel length; the CFM estimator is the non-causal
multi-scale U-Net (models/estimator_v1.py).  Streaming continuity uses the
reference's z/mu flow-cache (prompt + last 34 frames are pinned across
chunks, flow_matching.py:57-66) rather than v2's KV-cached chunk protocol.

Shapes are dynamic in T (one compile per (token, mel) length pair) — the v1
family is a completeness/compat surface, not the optimized serving path;
the production EU models are all v2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import FlowV1Config
from cosyvoice2_eu_tpu.models.estimator_v1 import estimator_v1_forward, init_estimator_v1
from cosyvoice2_eu_tpu.models.generic_encoder import (
    generic_encoder_forward,
    init_generic_encoder,
)
from cosyvoice2_eu_tpu.models.length_regulator import (
    init_length_regulator,
    length_regulator_forward,
    length_regulator_inference,
)
from cosyvoice2_eu_tpu.ops.masks import make_non_pad_mask
from cosyvoice2_eu_tpu.utils.params import dense, embedding, init_dense, init_embedding


def init_flow_v1(rng, cfg: FlowV1Config) -> dict:
    ks = jax.random.split(rng, 6)
    return {
        "input_embedding": init_embedding(ks[0], cfg.vocab_size, cfg.input_size),
        "spk_embed_affine_layer": init_dense(ks[1], cfg.spk_embed_dim, cfg.output_size),
        "encoder": init_generic_encoder(ks[2], cfg.encoder),
        "encoder_proj": init_dense(ks[3], cfg.encoder.output_size, cfg.output_size),
        "length_regulator": init_length_regulator(ks[4], cfg.length_regulator),
        "estimator": init_estimator_v1(ks[5], cfg.estimator),
    }


def mel_len_for_tokens(cfg: FlowV1Config, n_tokens: int) -> int:
    """flow.py:128: mel frames produced by n generated tokens."""
    return int(n_tokens / cfg.input_frame_rate * cfg.sample_rate / cfg.mel_hop)


def _encode_tokens(params, cfg: FlowV1Config, token, token_len):
    """input embedding -> conformer encode -> 80-d projection."""
    t = token.shape[1]
    mask = make_non_pad_mask(token_len, t)[..., None].astype(jnp.float32)
    emb = embedding(params["input_embedding"], jnp.clip(token, 0)) * mask
    h, _ = generic_encoder_forward(params["encoder"], cfg.encoder, emb, token_len)
    return dense(params["encoder_proj"], h)


def _solve_euler_cfg_v1(params, cfg: FlowV1Config, z, mu, mask, spks, cond):
    """Batch-2 CFG Euler solve on the v1 estimator (flow_matching.py:73)."""
    from cosyvoice2_eu_tpu.models.flow import cosine_t_span

    b = z.shape[0]
    t_span = cosine_t_span(cfg.cfm.n_timesteps)
    rate = cfg.cfm.inference_cfg_rate
    mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask_in = jnp.concatenate([mask, mask], axis=0)
    # scan, not a Python loop: one traced U-Net body instead of n_timesteps
    # inlined copies (see models/flow.py solve_euler_cfg)
    t_curs = jnp.asarray(t_span[:-1], z.dtype)
    dts = jnp.asarray(t_span[1:] - t_span[:-1], z.dtype)

    def euler_step(x, tc_dt):
        t_cur, dt = tc_dt
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * b,), t_cur, x.dtype)
        dphi = estimator_v1_forward(
            params["estimator"], cfg.estimator, x_in, mask_in, mu_in, t_in,
            spks_in, cond_in,
        )
        v = (1.0 + rate) * dphi[:b] - rate * dphi[b:]
        return (x + dt.astype(x.dtype) * v).astype(z.dtype), None

    x, _ = jax.lax.scan(euler_step, z, (t_curs, dts))
    return x


def flow_v1_inference(
    params: dict,
    cfg: FlowV1Config,
    token: np.ndarray,
    prompt_token: np.ndarray,
    prompt_feat: np.ndarray,
    emb: np.ndarray,
    rng: jax.Array,
    flow_cache: Optional[jnp.ndarray] = None,
    z: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """flow.py:105 MaskedDiffWithXvec.inference (batch 1).

    token: (1, T2) generated speech tokens; prompt_token: (1, T1);
    prompt_feat: (1, mel_len1, 80); emb: (1, spk_embed_dim);
    flow_cache: (1, 80, cache_t, 2) pinned z/mu from the previous chunk;
    z: optional noise override (1, 80, mel_len1+mel_len2) — parity testing
    against the reference's torch.randn draw.
    Returns (mel (1, 80, mel_len2), new flow_cache).
    """
    token = jnp.asarray(token)
    prompt_token = jnp.asarray(prompt_token)
    prompt_feat = jnp.asarray(prompt_feat, jnp.float32)
    t1, t2 = prompt_token.shape[1], token.shape[1]

    emb = jnp.asarray(emb, jnp.float32)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    spks = dense(params["spk_embed_affine_layer"], emb)

    both = jnp.concatenate([prompt_token, token], axis=1)
    h = _encode_tokens(params, cfg, both, jnp.asarray([t1 + t2]))

    mel_len1 = prompt_feat.shape[1]
    mel_len2 = mel_len_for_tokens(cfg, t2)
    h = length_regulator_inference(
        params["length_regulator"], cfg.length_regulator,
        h[:, :t1], h[:, t1:], mel_len1, mel_len2,
        cfg.input_frame_rate, cfg.sample_rate, cfg.mel_hop,
    )
    mu = h.transpose(0, 2, 1)  # (1, 80, T)
    total = mel_len1 + mel_len2

    conds = jnp.zeros((1, total, cfg.output_size), mu.dtype)
    conds = conds.at[:, :mel_len1].set(prompt_feat)
    conds = conds.transpose(0, 2, 1)

    mask = jnp.ones((1, 1, total), mu.dtype)
    if z is None:
        z = jax.random.normal(rng, (1, cfg.output_size, total), mu.dtype)
    else:
        z = jnp.asarray(z, mu.dtype)
    # pin prompt/overlap z+mu from the previous chunk (flow_matching.py:57-61)
    if flow_cache is not None and flow_cache.shape[2] > 0:
        cs = flow_cache.shape[2]
        z = z.at[:, :, :cs].set(flow_cache[:, :, :, 0])
        mu = mu.at[:, :, :cs].set(flow_cache[:, :, :, 1])
    tail = cfg.cache_tail  # 34 for the production geometry (flow_matching.py:62)
    new_cache = jnp.stack(
        [
            jnp.concatenate([z[:, :, :mel_len1], z[:, :, -tail:]], axis=2),
            jnp.concatenate([mu[:, :, :mel_len1], mu[:, :, -tail:]], axis=2),
        ],
        axis=-1,
    )

    feat = _solve_euler_cfg_v1(params, cfg, z, mu, mask, spks, conds)
    return feat[:, :, mel_len1:], new_cache


def flow_v1_loss(params: dict, cfg: FlowV1Config, batch: dict, rng: jax.Array):
    """flow.py:61 MaskedDiffWithXvec.forward — the training objective.

    batch: speech_token (B, T), speech_token_len (B,), speech_feat
    (B, T_mel, 80), speech_feat_len (B,), embedding (B, spk_embed_dim).
    """
    from cosyvoice2_eu_tpu.train.losses import cfm_loss

    token = batch["speech_token"]
    token_len = batch["speech_token_len"]
    feat = batch["speech_feat"]
    feat_len = batch["speech_feat_len"]
    t_mel = feat.shape[1]

    emb = batch["embedding"].astype(jnp.float32)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    spks = dense(params["spk_embed_affine_layer"], emb)

    h = _encode_tokens(params, cfg, token, token_len)
    mel_mask = make_non_pad_mask(feat_len, t_mel)
    h = length_regulator_forward(
        params["length_regulator"], cfg.length_regulator, h, t_mel, mel_mask
    )

    # random prompt conditioning (flow.py:89: 50% of rows expose a random
    # prefix of up to 30% of the target as cond)
    k_keep, k_idx, k_cfm = jax.random.split(rng, 3)
    b = token.shape[0]
    use = jax.random.uniform(k_keep, (b,)) < 0.5
    frac = jax.random.uniform(k_idx, (b,))
    idx = (frac * 0.3 * feat_len.astype(jnp.float32)).astype(jnp.int32)
    pos = jnp.arange(t_mel)[None, :]
    cond_mask = use[:, None] & (pos < idx[:, None])
    conds = jnp.where(cond_mask[..., None], feat, 0.0).transpose(0, 2, 1)

    mask = mel_mask[:, None, :].astype(feat.dtype)
    loss = cfm_loss(
        lambda y, m, mu, t, s, c: estimator_v1_forward(
            params["estimator"], cfg.estimator, y, m, mu, t, s, c
        ),
        feat.transpose(0, 2, 1),
        mask,
        h.transpose(0, 2, 1),
        spks,
        conds,
        k_cfm,
        sigma_min=cfg.cfm.sigma_min,
        training_cfg_rate=cfg.cfm.training_cfg_rate,
    )
    return loss
