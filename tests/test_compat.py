"""Reference-compatible CosyVoice2 shim (the eval harness entry point)."""

import os

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


@pytest.mark.slow
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


def test_snapshot_download_contract(tmp_path, monkeypatch):
    """load()'s install-and-run path (reference standalone __init__.py:96-129):
    downloads into the cache dir, tolerates offline when opportunistic,
    raises when explicitly requested."""
    import cosyvoice2_eu_tpu as cosy

    target = tmp_path / "hub_cache"
    monkeypatch.setenv("COSY2EU_CACHE", str(target))

    calls = {}

    def fake_snapshot(repo_id, local_dir, **kw):
        calls["repo_id"] = repo_id
        os.makedirs(local_dir, exist_ok=True)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_snapshot)
    got = cosy._snapshot_download("hi-paris/CosyVoice2-0.5B-EU")
    assert got == str(target) and calls["repo_id"] == "hi-paris/CosyVoice2-0.5B-EU"

    def failing_snapshot(*a, **kw):
        raise OSError("no egress")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", failing_snapshot)
    # opportunistic: no cached llm.pt -> None (random-init path)
    assert cosy._snapshot_download("x/y") is None
    # explicitly requested -> surface the failure
    with pytest.raises(OSError):
        cosy._snapshot_download("x/y", required=True)
    # previously-cached snapshot survives offline
    (target / "llm.pt").write_bytes(b"")
    assert cosy._snapshot_download("x/y") == str(target)
