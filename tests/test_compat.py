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


def test_spk2info_pt_roundtrip(tmp_path):
    """The reference's spk2info.pt speaker store loads into our frontend
    (reference frontend.py:199-202 key names map onto prompt artifacts)."""
    import torch

    from cosyvoice2_eu_tpu.config import tiny_test_config
    from cosyvoice2_eu_tpu.frontend.frontend import Frontend

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    n_sp = 6
    data = {
        "alice": {
            "speech_feat": torch.from_numpy(
                rng.standard_normal((1, n_sp * 2, cfg.flow.output_size)).astype(np.float32)
            ),
            "speech_token": torch.from_numpy(
                rng.integers(0, 80, (1, n_sp)).astype(np.int64)
            ),
            "llm_embedding": torch.from_numpy(
                rng.standard_normal((1, cfg.frontend.spk_embed_dim)).astype(np.float32)
            ),
            "prompt_text": "bonjour",
        }
    }
    path = tmp_path / "spk2info.pt"
    torch.save(data, str(path))

    fe = Frontend(cfg)
    fe.load_spk_info(str(path))
    art = fe.get_spk("alice")
    assert art["prompt_feat"].shape == (n_sp * 2, cfg.flow.output_size)
    assert art["speech_tokens"].shape == (n_sp,)
    assert art["embedding"].shape == (cfg.frontend.spk_embed_dim,)
    assert art["prompt_text"] == "bonjour"
