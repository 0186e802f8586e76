"""Reference-compatible CosyVoice2 shim (the eval harness entry point)."""

import numpy as np
import pytest
import torch

import cosyvoice2_eu_tpu as cosy
from cosyvoice2_eu_tpu.config import tiny_test_config


@pytest.fixture(scope="module")
def shim():
    """compat.CosyVoice2 normally loads from model_dir; build one around the
    tiny random model the same way."""
    from cosyvoice2_eu_tpu.compat import CosyVoice2

    cfg = tiny_test_config()
    obj = CosyVoice2.__new__(CosyVoice2)
    obj._api = cosy.load(model_dir=None, config=cfg, seed=0, compute_dtype="float32")
    obj.sample_rate = obj._api.sample_rate
    obj.frontend = obj._api._frontend

    rng = np.random.default_rng(1)
    obj.frontend.speech_tokenizer_fn = lambda wav: rng.integers(
        0, cfg.flow.vocab_size, max(len(wav) // 640, 2)
    ).astype(np.int32)
    obj.frontend.spk_embedding_fn = lambda wav: rng.standard_normal(192).astype(np.float32)
    obj.frontend.mel_fn = lambda wav24: rng.standard_normal(
        (len(wav24) // 480, cfg.flow.output_size)
    ).astype(np.float32)
    return obj


def test_inference_cross_lingual_generator(shim):
    prompt = torch.zeros(1, 8000)
    outs = list(shim.inference_cross_lingual("bonjour le monde", prompt, stream=False))
    assert len(outs) >= 1
    speech = outs[0]["tts_speech"]
    assert isinstance(speech, torch.Tensor) and speech.dim() == 2 and speech.shape[0] == 1
    assert torch.isfinite(speech).all()


def test_zero_shot_spk_cache(shim):
    prompt = torch.zeros(1, 8000)
    assert shim.add_zero_shot_spk("salut", prompt, "spkA")
    assert "spkA" in shim.list_available_spks()
    outs = list(shim.inference_sft("bonjour", "spkA", stream=False))
    assert outs and outs[0]["tts_speech"].shape[0] == 1


def test_instruct_raises(shim):
    with pytest.raises(NotImplementedError):
        shim.inference_instruct()
