"""Flow-matching mel decoder: speech tokens -> 80-bin mel.

TPU-native re-design of the reference CausalMaskedDiffWithXvec +
CausalConditionalCFM (reference: cosy_repo/cosyvoice/flow/flow.py:151 and
cosy_repo/cosyvoice/flow/flow_matching.py:194):

* token embedding (6561 -> 512) -> upsample conformer encoder (2x) -> proj 80
* OT-CFM with cosine t-schedule; 10 Euler steps; classifier-free guidance by
  doubling the batch (cond + uncond) through one estimator call per step
* deterministic noise: a fixed torch.randn(1, 80, 15000) buffer generated with
  seed 0 (flow_matching.py:197-198), reproduced bit-exactly via torch CPU at
  init time.

The inference entry point is shape-static: tokens are right-padded to a bucket
and masked, so one compiled program serves all requests in the bucket.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import FlowConfig
from cosyvoice2_eu_tpu.models.encoder import init_upsample_conformer, upsample_conformer_forward
from cosyvoice2_eu_tpu.models.estimator import estimator_forward, init_estimator
from cosyvoice2_eu_tpu.ops.masks import make_non_pad_mask
from cosyvoice2_eu_tpu.utils.params import (
    dense,
    embedding,
    init_dense,
    init_embedding,
)


def make_rand_noise(num_frames: int, num_mels: int = 80) -> np.ndarray:
    """torch.randn(1, num_mels, num_frames) under seed 0, as the reference's
    fixed inference noise (flow_matching.py:197-198)."""
    import torch

    gen_state = torch.random.get_rng_state()
    try:
        torch.manual_seed(0)
        noise = torch.randn([1, num_mels, num_frames])
    finally:
        torch.random.set_rng_state(gen_state)
    return noise.numpy()


def init_flow(rng, cfg: FlowConfig) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    return {
        "input_embedding": init_embedding(k1, cfg.vocab_size, cfg.input_size),
        "spk_embed_affine_layer": init_dense(k2, cfg.spk_embed_dim, cfg.output_size),
        "encoder": init_upsample_conformer(k3, cfg.encoder),
        "encoder_proj": init_dense(k4, cfg.encoder.output_size, cfg.output_size),
        "estimator": init_estimator(k5, cfg.estimator),
        # non-trainable deterministic inference noise
        "rand_noise": jnp.asarray(make_rand_noise(cfg.cfm.rand_noise_frames, cfg.output_size)),
    }


def cosine_t_span(n_timesteps: int) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n_timesteps + 1, dtype=np.float32)
    return 1.0 - np.cos(t * 0.5 * np.pi)


def solve_euler_cfg(
    params: dict,
    cfg: FlowConfig,
    z: jnp.ndarray,
    mu: jnp.ndarray,
    mask: jnp.ndarray,
    spks: jnp.ndarray,
    cond: jnp.ndarray,
    streaming: bool = False,
) -> jnp.ndarray:
    """Fixed-step Euler ODE solve with batch-2 classifier-free guidance.

    z/mu/cond: (B, 80, T); mask: (B, 1, T); spks: (B, 80).
    Mirrors flow_matching.py:71-123 (solve_euler).
    """
    b = z.shape[0]
    t_span = cosine_t_span(cfg.cfm.n_timesteps)
    rate = cfg.cfm.inference_cfg_rate

    # CFG double batch: [cond | uncond]; uncond zeroes mu/spks/cond
    mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask_in = jnp.concatenate([mask, mask], axis=0)

    # lax.scan over Euler steps (NOT a Python loop): the body traces ONCE, so
    # the compiled program holds one U-Net instance instead of n_timesteps
    # copies — ~10x smaller executables (300 MB -> ~30 MB serialized), ~10x
    # faster compiles/AOT loads, identical math (steps differ only in the
    # t_cur/dt scalars threaded through as scan inputs).
    t_curs = jnp.asarray(t_span[:-1], z.dtype)
    dts = jnp.asarray(t_span[1:] - t_span[:-1], z.dtype)

    def euler_step(x, tc_dt):
        t_cur, dt = tc_dt
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * b,), t_cur, x.dtype)
        dphi = estimator_forward(
            params["estimator"], cfg.estimator, x_in, mask_in, mu_in, t_in, spks_in, cond_in,
            streaming=streaming,
        )
        dphi_c, dphi_u = dphi[:b], dphi[b:]
        v = (1.0 + rate) * dphi_c - rate * dphi_u
        # keep the Euler state in the compute dtype (an fp32 dt would
        # silently promote everything to fp32)
        return (x + dt.astype(x.dtype) * v).astype(z.dtype), None

    x, _ = jax.lax.scan(euler_step, z, (t_curs, dts))
    return x


def flow_inference(
    params: dict,
    cfg: FlowConfig,
    token: jnp.ndarray,
    token_len: jnp.ndarray,
    prompt_feat: jnp.ndarray,
    prompt_feat_len: jnp.ndarray,
    embedding_vec: jnp.ndarray,
    streaming: bool = False,
    finalize: bool = True,
) -> jnp.ndarray:
    """Generate mel for (prompt + new) speech tokens.

    Args:
      token: (B, T_tok) prompt tokens followed by generated tokens,
        right-padded; token_len: (B,) valid counts (prompt + generated).
      prompt_feat: (B, T_mel_max, 80) prompt mel (first prompt_feat_len valid).
      embedding_vec: (B, 192) raw x-vector (normalized here, flow.py:248).
      finalize=False drops the last pre_lookahead_len tokens from the body and
        feeds them as encoder right-context (flow.py:259-263).

    Returns mel (B, 80, T_tok * ratio) — caller slices
    [prompt_mel_len : token_len * ratio].
    """
    b, t_tok = token.shape
    ratio = cfg.token_mel_ratio
    # compute dtype follows the parameters (bf16 in production inference)
    dtype = params["input_embedding"]["weight"].dtype

    spk = embedding_vec / jnp.maximum(
        jnp.linalg.norm(embedding_vec, axis=1, keepdims=True), 1e-12
    )
    spk = dense(params["spk_embed_affine_layer"], spk.astype(dtype))

    tok_mask = make_non_pad_mask(token_len, t_tok)[..., None].astype(dtype)
    h_tok = embedding(params["input_embedding"], jnp.maximum(token, 0)).astype(dtype) * tok_mask

    if finalize:
        h, _ = upsample_conformer_forward(
            params["encoder"], cfg.encoder, h_tok, token_len, streaming=streaming
        )
    else:
        la = cfg.pre_lookahead_len
        body, ctx = h_tok[:, :-la], h_tok[:, -la:]
        h, _ = upsample_conformer_forward(
            params["encoder"], cfg.encoder, body, token_len - la, context=ctx,
            streaming=streaming,
        )
        # reference keeps mel length = body tokens * ratio in this path
        t_tok = t_tok - la
    h = dense(params["encoder_proj"], h)  # (B, T_mel, 80)

    t_mel = t_tok * ratio
    mel_len = token_len * ratio if finalize else (token_len - cfg.pre_lookahead_len) * ratio

    # conds: prompt mel in front, zeros after (flow.py:267-270)
    frame_idx = jnp.arange(t_mel)[None, :, None]
    pf = prompt_feat[:, :t_mel] if prompt_feat.shape[1] >= t_mel else jnp.pad(
        prompt_feat, ((0, 0), (0, t_mel - prompt_feat.shape[1]), (0, 0))
    )
    conds = jnp.where(frame_idx < prompt_feat_len[:, None, None], pf, 0.0)
    conds = conds.transpose(0, 2, 1).astype(h.dtype)  # (B, 80, T_mel)

    mask = make_non_pad_mask(mel_len, t_mel)[:, None].astype(h.dtype)  # (B,1,T)
    mu = h.transpose(0, 2, 1) * mask

    noise = params["rand_noise"][:, :, :t_mel].astype(h.dtype)
    z = jnp.broadcast_to(noise, (b, cfg.output_size, t_mel)) * 1.0

    mel = solve_euler_cfg(params, cfg, z, mu, mask, spk, conds, streaming=streaming)
    return mel.astype(jnp.float32)
