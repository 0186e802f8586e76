"""Evaluation harness: metrics sanity + pipeline over a synthetic dataset."""

import os
import wave

import numpy as np
import pytest

from cosyvoice2_eu_tpu.eval import metrics as M
from cosyvoice2_eu_tpu.eval.run_eval import evaluate_model, read_dataset, resolve_run_id


def _sine(freq, seconds=0.6, sr=24000, noise=0.0):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.4 * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + noise * np.random.default_rng(0).standard_normal(len(t))
    return x.astype(np.float32)


def _write_wav(path, x, sr=24000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


def test_mcd_identical_is_zero_and_orders():
    a = _sine(220)
    b = _sine(220, noise=0.05)
    c = _sine(440, noise=0.2)
    assert M.mcd(a, a) < 1e-3
    assert M.mcd(a, b) < M.mcd(a, c)


def test_pitch_metrics_sine_pair():
    a = _sine(200, seconds=0.8)
    b = _sine(210, seconds=0.8)
    pm = M.pitch_metrics(a, b)
    assert pm.f0_rmse < 30
    assert pm.f0_corr > -1.0
    assert pm.vuv_error < 20
    # 5% deviation < 20% threshold -> low GPE
    assert pm.gpe < 50


def test_wer_and_normalizer():
    assert M.wer("bonjour le monde", "bonjour le monde") == 0.0
    assert M.wer("bonjour le monde", "bonjour monde") == pytest.approx(1 / 3)
    assert M.normalize_text_for_wer("Été, ça va!") == "ete ca va"


def test_resolve_run_id():
    assert resolve_run_id(500, "bl", "fr", False) == "500-averaged-bl-FR"
    assert resolve_run_id(1500, "bl", "de", True) == "1500-averaged-bl-mix"


def test_pipeline_over_synthetic_dataset(tmp_path):
    root = tmp_path / "test"
    for spk, freq in [("spk1", 200.0), ("spk2", 300.0)]:
        d = root / spk / "a"
        os.makedirs(d)
        for i in range(2):
            _write_wav(d / f"{spk}_utt{i}.wav", _sine(freq + 10 * i))
            (d / f"{spk}_utt{i}.normalized.txt").write_text("bonjour le monde")
    samples = read_dataset(str(root))
    assert len(samples) == 4

    def synthesize(text, prompt_path):
        # fake synthesizer: returns the prompt with noise (tests the plumbing)
        from cosyvoice2_eu_tpu.frontend.frontend import load_wav

        wav = load_wav(prompt_path, 24000)
        return wav + 0.01 * np.random.default_rng(0).standard_normal(len(wav)).astype(np.float32), 0.05

    out = tmp_path / "results"
    summary = evaluate_model(synthesize, samples, str(out), "fake_model")
    assert summary["n"] == 4 and summary["n_failed"] == 0
    assert "rtf" in summary and "mcd" in summary
    assert os.path.exists(out / "fake_model_results.csv")
    assert os.path.exists(out / "fake_model_report.md")
