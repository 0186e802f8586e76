"""Name registries: yaml-style component names -> implementations.

The reference resolves hyperpyyaml component names through class registries
(cosy_repo/cosyvoice/utils/class_utils.py: COSYVOICE_ACTIVATION_CLASSES,
COSYVOICE_SUBSAMPLE_CLASSES, COSYVOICE_EMB_CLASSES,
COSYVOICE_ATTENTION_CLASSES, get_model_type:77).  This framework is
functional — components are (init_fn, apply_fn) pairs selected by string
fields on frozen dataclass configs — so the registry's job here is the
name->implementation mapping and validation layer those configs sit on:

* ``ACTIVATIONS``: name -> jax activation callable (the one table that maps
  to first-class values; generic_encoder consumes it directly).
* ``SUBSAMPLE_KINDS`` / ``POS_ENC_KINDS`` / ``ATTENTION_KINDS``: the legal
  names for GenericEncoderConfig's input_layer / pos_enc_layer_type /
  selfattention_layer_type, each with its reference class for parity
  bookkeeping.
* ``SCHEDULERS``: name -> optax schedule factory (utils/scheduler.py names).
* ``get_model_type``: config pytree -> model-family tag, the analog of the
  reference's isinstance dispatch (class_utils.py:77) over typed configs.

Deliberately NOT replicated: hyperpyyaml's arbitrary-callable execution —
configs stay data, not code.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# activations (class_utils.py:43 COSYVOICE_ACTIVATION_CLASSES + Snake)
# ---------------------------------------------------------------------------

ACTIVATIONS: Dict[str, Callable] = {
    "hardtanh": jax.nn.hard_tanh,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "swish": jax.nn.silu,  # torch maps "swish" -> nn.SiLU
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),  # torch nn.GELU is erf-exact
}


def get_activation(name: str) -> Callable:
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise KeyError(
            f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)}"
        ) from None


# ---------------------------------------------------------------------------
# encoder component name tables.  Values are the reference classes each name
# resolves to (class_utils.py:51,62,72) — parity bookkeeping; resolution
# happens inside models/generic_encoder.py keyed on these same names.
# ---------------------------------------------------------------------------

SUBSAMPLE_KINDS: Dict[str, str] = {
    "linear": "LinearNoSubsampling",
    "linear_legacy": "LegacyLinearNoSubsampling",
    "embed": "EmbedinigNoSubsampling",
    "conv1d2": "Conv1dSubsampling2",
    "conv2d": "Conv2dSubsampling4",
    "conv2d6": "Conv2dSubsampling6",
    "conv2d8": "Conv2dSubsampling8",
}

POS_ENC_KINDS: Dict[str, str] = {
    "embed": "PositionalEncoding",
    "abs_pos": "PositionalEncoding",
    "rel_pos": "RelPositionalEncoding",
    "rel_pos_espnet": "EspnetRelPositionalEncoding",
    "no_pos": "NoPositionalEncoding",
    "abs_pos_whisper": "WhisperPositionalEncoding",
    "embed_learnable_pe": "LearnablePositionalEncoding",
}

ATTENTION_KINDS: Dict[str, str] = {
    "selfattn": "MultiHeadedAttention",
    "rel_selfattn": "RelPositionMultiHeadedAttention",
}


def validate_encoder_names(cfg) -> None:
    """Reject unknown component names with the full legal table (the error a
    bad yaml name produces in the reference's registry lookup)."""
    if cfg.input_layer not in SUBSAMPLE_KINDS:
        raise KeyError(
            f"unknown input_layer {cfg.input_layer!r}; known: {sorted(SUBSAMPLE_KINDS)}"
        )
    if cfg.pos_enc_layer_type not in POS_ENC_KINDS:
        raise KeyError(
            f"unknown pos_enc_layer_type {cfg.pos_enc_layer_type!r}; "
            f"known: {sorted(POS_ENC_KINDS)}"
        )
    if cfg.selfattention_layer_type not in ATTENTION_KINDS:
        raise KeyError(
            f"unknown selfattention_layer_type {cfg.selfattention_layer_type!r}; "
            f"known: {sorted(ATTENTION_KINDS)}"
        )
    get_activation(cfg.activation_type)


# ---------------------------------------------------------------------------
# LR schedulers (utils/scheduler.py names, resolved by train/optim.py)
# ---------------------------------------------------------------------------

def _schedulers():
    from cosyvoice2_eu_tpu.train import optim

    return {
        "warmuplr": optim.warmup_lr,
        "constantlr": optim.constant_lr,
        "noamhold": optim.noam_hold_annealing,
    }


def get_scheduler(name: str) -> Callable:
    table = _schedulers()
    try:
        return table[name]
    except KeyError:
        raise KeyError(
            f"unknown scheduler {name!r}; known: {sorted(table)}"
        ) from None


# ---------------------------------------------------------------------------
# model-family dispatch (class_utils.py:77 get_model_type)
# ---------------------------------------------------------------------------

def get_model_type(cfg) -> str:
    """TTSConfig -> family tag.

    The reference dispatches on the instantiated module classes; the typed
    analog dispatches on the defining structural trait in the config: the
    v2 family's CausalMaskedDiffWithXvec upsamples speech tokens inside the
    flow (token_mel_ratio >= 2, flow.py:151), the v1 family's
    MaskedDiffWithXvec maps tokens 1:1 and stretches with a length
    regulator (flow.py:24).  Unknown combinations raise, mirroring
    class_utils.py:83's TypeError.
    """
    flow = cfg.flow
    ratio = getattr(flow, "token_mel_ratio", None)
    if ratio is not None and ratio >= 2:
        return "cosyvoice2"
    if ratio == 1 or hasattr(flow, "length_regulator"):
        return "cosyvoice1"
    raise TypeError("No valid model type found for this config combination")
