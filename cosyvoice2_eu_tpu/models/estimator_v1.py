"""Non-causal multi-scale 1-D U-Net velocity estimator (the v1 family).

TPU-native port of the reference ConditionalDecoder
(cosy_repo/cosyvoice/flow/decoder.py:88), the estimator behind v1's
MaskedDiffWithXvec flow: channel concat [x, mu, spks, cond], a REAL
multi-resolution U-Net — stride-2 Downsample1D between down stages, a stack
of mid stages at half resolution, transpose-conv Upsample1D back up with
skip connections — all convs zero-padded (non-causal), Block1D =
conv3/GroupNorm(8)/Mish (matcha decoder.py:32), attention full-bidirectional
over valid positions.  Contrast with the v2 causal estimator
(models/estimator.py): that one is single-resolution with causal convs and
chunk masks; this one trades streamability for the larger receptive field.

The diffusers-style transformer blocks are shared with the v2 estimator
(init_transformer_block / transformer_block) — identical arithmetic, only
the attention mask differs (always full here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.config import EstimatorV1Config
from cosyvoice2_eu_tpu.models.estimator import (
    _mish,
    init_transformer_block,
    sinusoidal_time_emb,
    transformer_block,
)
from cosyvoice2_eu_tpu.ops.pallas.flash_attention import attention_backend
from cosyvoice2_eu_tpu.utils.params import (
    conv1d,
    conv_transpose1d,
    dense,
    group_norm,
    init_conv1d,
    init_conv_transpose1d,
    init_dense,
    init_group_norm,
)


# -- Block1D: Conv1d(k3,p1) -> GroupNorm(8) -> Mish (matcha decoder.py:32) ---

def init_block1d(rng, dim, dim_out):
    return {"conv": init_conv1d(rng, dim, dim_out, 3), "norm": init_group_norm(dim_out)}


def block1d(p, x, mask, groups: int = 8):
    """x: (B, C, T); mask: (B, 1, T)."""
    h = conv1d(p["conv"], x * mask, padding=1)
    h = group_norm(p["norm"], h, groups)
    return _mish(h) * mask


def init_resnet1d(rng, dim, dim_out, time_dim):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "block1": init_block1d(k1, dim, dim_out),
        "block2": init_block1d(k2, dim_out, dim_out),
        "mlp": init_dense(k3, time_dim, dim_out),
        "res_conv": init_conv1d(k4, dim, dim_out, 1),
    }


def resnet1d(p, x, mask, temb):
    """ResnetBlock1D (matcha decoder.py:46)."""
    h = block1d(p["block1"], x, mask)
    h = h + dense(p["mlp"], _mish(temb))[:, :, None]
    h = block1d(p["block2"], h, mask)
    return h + conv1d(p["res_conv"], x * mask)


# -- full estimator ----------------------------------------------------------

def init_estimator_v1(rng, cfg: EstimatorV1Config) -> dict:
    time_dim = cfg.channels[0] * 4
    n_keys = 8 + (2 + cfg.num_mid_blocks + 2 * len(cfg.channels)) * (3 + cfg.n_blocks)
    ks = iter(jax.random.split(rng, n_keys))

    def stage(dim_in, dim_out):
        return {
            "resnet": init_resnet1d(next(ks), dim_in, dim_out, time_dim),
            "transformer": [
                init_transformer_block(next(ks), dim_out, cfg.num_heads, cfg.attention_head_dim)
                for _ in range(cfg.n_blocks)
            ],
        }

    down, out_ch = [], cfg.in_channels
    for ch in cfg.channels:
        s = stage(out_ch, ch)
        # Downsample1D is a stride-2 k3 conv (decoder.py:64); the last stage
        # keeps resolution with a plain k3 conv (decoder.py:140) — same
        # parameters, the stride is applied at call time
        s["conv"] = init_conv1d(next(ks), ch, ch, 3)
        down.append(s)
        out_ch = ch

    mid = [stage(cfg.channels[-1], cfg.channels[-1]) for _ in range(cfg.num_mid_blocks)]

    up, rev = [], tuple(reversed(cfg.channels)) + (cfg.channels[0],)
    for i in range(len(rev) - 1):
        s = stage(rev[i] * 2, rev[i + 1])
        is_last = i == len(rev) - 2
        s["conv"] = (init_conv1d(next(ks), rev[i + 1], rev[i + 1], 3) if is_last
                     else init_conv_transpose1d(next(ks), rev[i + 1], rev[i + 1], 4))
        up.append(s)

    return {
        "time_mlp": {
            "linear_1": init_dense(next(ks), cfg.in_channels, time_dim),
            "linear_2": init_dense(next(ks), time_dim, time_dim),
        },
        "down": down,
        "mid": mid,
        "up": up,
        "final_block": init_block1d(next(ks), rev[-1], rev[-1]),
        "final_proj": init_conv1d(next(ks), rev[-1], cfg.out_channels, 1),
    }


def estimator_v1_forward(
    params: dict,
    cfg: EstimatorV1Config,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    t: jnp.ndarray,
    spks: jnp.ndarray,
    cond: jnp.ndarray,
) -> jnp.ndarray:
    """Predict velocity; decoder.py:210 ConditionalDecoder.forward.

    x/mu/cond: (B, 80, T); mask: (B, 1, T); t: (B,); spks: (B, 80).
    """
    b, _, T = x.shape
    temb = sinusoidal_time_emb(t, cfg.in_channels, cfg.time_embed_scale).astype(x.dtype)
    temb = dense(params["time_mlp"]["linear_1"], temb)
    temb = dense(params["time_mlp"]["linear_2"], jax.nn.silu(temb))

    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, :, None], (b, spks.shape[1], T)), cond], axis=1
    )

    backend = attention_backend()

    def run_blocks(sp, h, m):
        h = resnet1d(sp["resnet"], h, m, temb)
        lengths = jnp.sum(m[:, 0].astype(jnp.int32), axis=-1)
        ht = h.transpose(0, 2, 1)
        for tp in sp["transformer"]:
            ht = transformer_block(tp, ht, (lengths, 0, backend), cfg.num_heads)
        return ht.transpose(0, 2, 1)

    # down path: skip saved BEFORE the downsample (decoder.py:251)
    hiddens, masks = [], [mask]
    for i, sp in enumerate(params["down"]):
        m = masks[-1]
        h = run_blocks(sp, h, m)
        hiddens.append(h)
        is_last = i == len(params["down"]) - 1
        h = conv1d(sp["conv"], h * m, padding=1, stride=1 if is_last else 2)
        masks.append(m[:, :, ::2])
    masks = masks[:-1]

    for sp in params["mid"]:
        h = run_blocks(sp, h, masks[-1])

    for i, sp in enumerate(params["up"]):
        m = masks.pop()
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, :, : skip.shape[-1]], skip], axis=1)
        h = run_blocks(sp, h, m)
        if i == len(params["up"]) - 1:
            h = conv1d(sp["conv"], h * m, padding=1)
        else:
            h = conv_transpose1d(sp["conv"], h * m, stride=2, padding=1)
        m_up = m

    h = block1d(params["final_block"], h, m_up)
    out = conv1d(params["final_proj"], h * m_up)
    return out * mask
