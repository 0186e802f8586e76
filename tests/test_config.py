"""Config serialization / overrides and AOT export."""

import json

import jax
import numpy as np

from cosyvoice2_eu_tpu.config import (
    TTSConfig,
    config_to_dict,
    load_config,
    qwen3_0_6b_config,
    tiny_test_config,
)


def test_defaults_match_reference_yaml():
    """Spot-check the knob surface against conf/cosyvoice2.yaml values."""
    cfg = TTSConfig()
    assert cfg.sample_rate == 24000
    assert cfg.chunk_size == 25
    assert cfg.llm.speech_token_size == 6561
    assert cfg.llm.mix_ratio == (5, 15)
    assert cfg.llm.top_p == 0.8 and cfg.llm.top_k == 25
    assert cfg.flow.encoder.num_blocks == 6 and cfg.flow.encoder.attention_heads == 8
    assert cfg.flow.estimator.num_mid_blocks == 12 and cfg.flow.estimator.n_blocks == 4
    assert cfg.flow.cfm.inference_cfg_rate == 0.7 and cfg.flow.cfm.n_timesteps == 10
    assert cfg.hift.upsample_rates == (8, 5, 3)
    assert cfg.hift.upsample_scale == 480
    assert cfg.mel.n_fft == 1920 and cfg.mel.hop_size == 480


def test_load_config_overrides(tmp_path):
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps({"llm": {"top_k": 50}, "chunk_size": 50}))
    cfg = load_config(str(path), overrides={"llm": {"top_p": 0.95}})
    assert cfg.llm.top_k == 50
    assert cfg.llm.top_p == 0.95
    assert cfg.chunk_size == 50
    # untouched knobs keep defaults
    assert cfg.flow.estimator.num_mid_blocks == 12


def test_roundtrip_dict():
    d = config_to_dict(TTSConfig())
    assert d["hift"]["resblock_dilation_sizes"] == [[1, 3, 5], [1, 3, 5], [1, 3, 5]]


def test_qwen3_preset():
    bb = qwen3_0_6b_config()
    assert bb.use_qk_norm and not bb.attention_bias
    assert bb.head_dim == 128


def test_export_and_reload(tmp_path):
    from cosyvoice2_eu_tpu.models.flow import init_flow
    from cosyvoice2_eu_tpu.runtime.export import export_flow_estimator, load_exported

    cfg = tiny_test_config().flow
    params = init_flow(jax.random.key(0), cfg)
    # cast like production
    params_b = jax.tree.map(
        lambda a: a.astype("bfloat16") if a.dtype.kind == "f" else a, params
    )
    paths = export_flow_estimator(params_b, cfg, [32], str(tmp_path))
    exported = load_exported(paths[0])
    rng = np.random.default_rng(0)
    T = 32
    args = (
        params_b["estimator"],
        np.zeros((2, cfg.output_size, T), "bfloat16"),
        np.ones((2, 1, T), "bfloat16"),
        np.zeros((2, cfg.output_size, T), "bfloat16"),
        np.full((2,), 0.5, "bfloat16"),
        np.zeros((2, cfg.output_size), "bfloat16"),
        np.zeros((2, cfg.output_size, T), "bfloat16"),
    )
    out = exported.call(*args)
    assert out.shape == (2, cfg.output_size, T)
