"""v1 checkpoint (torch .pt) -> JAX pytree conversion.

Maps v1-family state dicts — TransformerLM (cosy_repo/cosyvoice/llm/llm.py:120),
MaskedDiffWithXvec (flow/flow.py:24) with InterpolateRegulator
(flow/length_regulator.py:21) and ConditionalDecoder (flow/decoder.py:88) —
onto the pytrees of models/llm_v1.py / models/flow_v1.py.  v1 shares the
HiFTGenerator vocoder with v2 at 22.05 kHz, so hift.pt goes through the
existing convert_hift (runtime/checkpoint.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cosyvoice2_eu_tpu.config import (
    EstimatorV1Config,
    FlowV1Config,
    LengthRegulatorConfig,
    LMV1Config,
)
from cosyvoice2_eu_tpu.models.generic_encoder import convert_generic_encoder
from cosyvoice2_eu_tpu.runtime.checkpoint import _State


def _sub_state(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    p = prefix + "."
    return {k[len(p):]: v for k, v in state.items() if k.startswith(p)}


def convert_llm_v1(state: Dict[str, np.ndarray], cfg: LMV1Config) -> dict:
    """llm.pt (TransformerLM) -> init_lm_v1 pytree."""
    s = _State(state)
    out = {
        "text_embedding": {"weight": s.take("text_embedding.weight")},
        "text_encoder": convert_generic_encoder(
            _sub_state(state, "text_encoder"), cfg.text_encoder
        ),
        "text_encoder_affine_layer": s.linear("text_encoder_affine_layer"),
        "llm_embedding": {"weight": s.take("llm_embedding.weight")},
        "speech_embedding": {"weight": s.take("speech_embedding.weight")},
        "spk_embed_affine_layer": s.linear("spk_embed_affine_layer"),
        "llm": convert_generic_encoder(_sub_state(state, "llm"), cfg.llm),
        "llm_decoder": s.linear("llm_decoder"),
    }
    return out


# ---------------------------------------------------------------------------
# flow.pt (MaskedDiffWithXvec)
# ---------------------------------------------------------------------------

def _block1d(s: _State, pre: str) -> dict:
    # matcha Block1D: .block.0 Conv1d, .block.1 GroupNorm (decoder.py:32)
    return {"conv": s.linear(f"{pre}.block.0"), "norm": s.norm(f"{pre}.block.1")}


def _resnet1d(s: _State, pre: str) -> dict:
    # matcha ResnetBlock1D: mlp = Sequential(Mish, Linear) -> mlp.1
    return {
        "block1": _block1d(s, f"{pre}.block1"),
        "block2": _block1d(s, f"{pre}.block2"),
        "mlp": s.linear(f"{pre}.mlp.1"),
        "res_conv": s.linear(f"{pre}.res_conv"),
    }


def _basic_transformer(s: _State, pre: str) -> dict:
    return {
        "norm1": s.norm(f"{pre}.norm1"),
        "to_q": s.linear(f"{pre}.attn1.to_q", bias=False),
        "to_k": s.linear(f"{pre}.attn1.to_k", bias=False),
        "to_v": s.linear(f"{pre}.attn1.to_v", bias=False),
        "to_out": s.linear(f"{pre}.attn1.to_out.0"),
        "norm3": s.norm(f"{pre}.norm3"),
        "ff_in": s.linear(f"{pre}.ff.net.0.proj"),
        "ff_out": s.linear(f"{pre}.ff.net.2"),
    }


def _updown_conv(s: _State, pre: str) -> dict:
    """down_blocks.i.2 / up_blocks.i.2: Downsample1D/Upsample1D wrap the conv
    in a .conv attribute; the is_last plain Conv1d holds weights directly."""
    return s.linear(f"{pre}.conv") if s.has(f"{pre}.conv.weight") else s.linear(pre)


def convert_estimator_v1(state: Dict[str, np.ndarray], cfg: EstimatorV1Config,
                         prefix: str = "") -> dict:
    s = _State(state)
    p = prefix + "." if prefix else ""

    def stage(pre: str, n_blocks: int) -> dict:
        return {
            "resnet": _resnet1d(s, f"{pre}.0"),
            "transformer": [
                _basic_transformer(s, f"{pre}.1.{j}") for j in range(n_blocks)
            ],
        }

    down = []
    for i in range(len(cfg.channels)):
        st = stage(f"{p}down_blocks.{i}", cfg.n_blocks)
        st["conv"] = _updown_conv(s, f"{p}down_blocks.{i}.2")
        down.append(st)
    mid = [stage(f"{p}mid_blocks.{i}", cfg.n_blocks) for i in range(cfg.num_mid_blocks)]
    up = []
    for i in range(len(cfg.channels)):
        st = stage(f"{p}up_blocks.{i}", cfg.n_blocks)
        st["conv"] = _updown_conv(s, f"{p}up_blocks.{i}.2")
        up.append(st)

    return {
        "time_mlp": {
            "linear_1": s.linear(f"{p}time_mlp.linear_1"),
            "linear_2": s.linear(f"{p}time_mlp.linear_2"),
        },
        "down": down,
        "mid": mid,
        "up": up,
        "final_block": _block1d(s, f"{p}final_block"),
        "final_proj": s.linear(f"{p}final_proj"),
    }


def convert_length_regulator(state: Dict[str, np.ndarray],
                             cfg: LengthRegulatorConfig,
                             prefix: str = "") -> dict:
    """InterpolateRegulator.model = Sequential([Conv1d, GroupNorm, Mish] * n
    ++ [Conv1d 1x1]) (length_regulator.py:31-42)."""
    s = _State(state)
    p = prefix + "." if prefix else ""
    blocks = [
        {"conv": s.linear(f"{p}model.{3 * i}"), "norm": s.norm(f"{p}model.{3 * i + 1}")}
        for i in range(len(cfg.sampling_ratios))
    ]
    return {"blocks": blocks, "proj": s.linear(f"{p}model.{3 * len(cfg.sampling_ratios)}")}


def convert_flow_v1(state: Dict[str, np.ndarray], cfg: FlowV1Config) -> dict:
    """flow.pt (MaskedDiffWithXvec) -> init_flow_v1 pytree."""
    s = _State(state)
    return {
        "input_embedding": {"weight": s.take("input_embedding.weight")},
        "spk_embed_affine_layer": s.linear("spk_embed_affine_layer"),
        "encoder": convert_generic_encoder(_sub_state(state, "encoder"), cfg.encoder),
        "encoder_proj": s.linear("encoder_proj"),
        "length_regulator": convert_length_regulator(
            _sub_state(state, "length_regulator"), cfg.length_regulator
        ),
        "estimator": convert_estimator_v1(
            _sub_state(state, "decoder.estimator"), cfg.estimator
        ),
    }
