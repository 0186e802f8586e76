"""Registry: name tables + validation + model-family dispatch.

Reference: cosy_repo/cosyvoice/utils/class_utils.py.
"""

import dataclasses

import jax
import numpy as np
import pytest

from cosyvoice2_eu_tpu import registry
from cosyvoice2_eu_tpu.config import GenericEncoderConfig, tiny_test_config


def test_activation_names_match_reference_table():
    # class_utils.py:43 COSYVOICE_ACTIVATION_CLASSES keys
    assert set(registry.ACTIVATIONS) == {
        "hardtanh", "tanh", "relu", "selu", "swish", "gelu",
    }
    x = np.linspace(-2, 2, 9, dtype=np.float32)
    for name, fn in registry.ACTIVATIONS.items():
        y = np.asarray(fn(x))
        assert y.shape == x.shape and np.isfinite(y).all(), name
    with pytest.raises(KeyError, match="unknown activation"):
        registry.get_activation("mish")


def test_component_name_tables_match_reference():
    # class_utils.py:51,62,72 (paraformer_dummy is ASR-only dead weight)
    assert set(registry.SUBSAMPLE_KINDS) == {
        "linear", "linear_legacy", "embed", "conv1d2", "conv2d",
        "conv2d6", "conv2d8",
    }
    assert set(registry.POS_ENC_KINDS) == {
        "embed", "abs_pos", "rel_pos", "rel_pos_espnet", "no_pos",
        "abs_pos_whisper", "embed_learnable_pe",
    }
    assert set(registry.ATTENTION_KINDS) == {"selfattn", "rel_selfattn"}


def test_validate_encoder_names_rejects_unknown():
    from cosyvoice2_eu_tpu.models.generic_encoder import init_generic_encoder

    good = GenericEncoderConfig(
        input_size=8, output_size=8, attention_heads=2, linear_units=16,
        num_blocks=1, arch="transformer", input_layer="linear",
        pos_enc_layer_type="abs_pos", selfattention_layer_type="selfattn",
        activation_type="relu", use_cnn_module=False, macaron_style=False,
    )
    init_generic_encoder(jax.random.PRNGKey(0), good)  # validates + builds
    for field, bad in [("input_layer", "conv3d"),
                       ("pos_enc_layer_type", "rotary"),
                       ("selfattention_layer_type", "flash"),
                       ("activation_type", "mish")]:
        cfg = dataclasses.replace(good, **{field: bad})
        with pytest.raises(KeyError, match="unknown"):
            init_generic_encoder(jax.random.PRNGKey(0), cfg)


def test_scheduler_registry():
    for name in ("warmuplr", "constantlr", "noamhold"):
        sched = registry.get_scheduler(name)(1e-3, 10)
        assert np.isfinite(float(sched(5)))
    with pytest.raises(KeyError, match="unknown scheduler"):
        registry.get_scheduler("cosine_annealing")


def test_get_model_type():
    cfg = tiny_test_config()
    assert registry.get_model_type(cfg) == "cosyvoice2"
    v1_flow = dataclasses.replace(cfg.flow, token_mel_ratio=1)
    assert registry.get_model_type(dataclasses.replace(cfg, flow=v1_flow)) == "cosyvoice1"
