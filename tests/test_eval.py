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


class _FakeModel:
    """Minimal Cosy2EU-like surface for the Synthesizer wrapper."""

    sample_rate = 24000

    def __init__(self):
        from cosyvoice2_eu_tpu.frontend.frontend import load_wav

        self._load = load_wav
        self._spk = {}

        class _FE:
            get_spk = lambda _self, k: self._spk[k]

        self._frontend = _FE()

    def add_zero_shot_spk(self, prompt_text, prompt, spk_id):
        self._spk[spk_id] = prompt
        return True

    def tts(self, text, prompt, **kw):
        wav = (
            self._load(prompt, 24000)
            if isinstance(prompt, str)
            else np.zeros(2400, np.float32)
        )
        noise = 0.01 * np.random.default_rng(0).standard_normal(len(wav))
        return (wav + noise.astype(np.float32))[None], 24000


def test_full_matrix_pipeline(tmp_path):
    """hours x setting matrix -> per-model CSVs + combined + analyses +
    markdown + web charts (run_evaluation_pipeline.py:444-624 shape)."""
    from cosyvoice2_eu_tpu.eval import report
    from cosyvoice2_eu_tpu.eval.pipeline import EvaluationPipeline
    from cosyvoice2_eu_tpu.eval.synthesizer import Synthesizer

    root = tmp_path / "test"
    for spk, freq in [("spk1", 200.0), ("spk2", 300.0)]:
        d = root / spk
        os.makedirs(d)
        for i in range(2):
            _write_wav(d / f"{spk}_utt{i}.wav", _sine(freq + 10 * i))
            (d / f"{spk}_utt{i}.normalized.txt").write_text("bonjour le monde")

    cfg = {
        "models": {
            "pretrained": {"setting": "original"},
            "full_finetuned": {"setting": "llm_flow_hifigan"},
        },
        "hours": [50, 100],
        "results_dir": str(tmp_path / "results"),
        "timeout_s": 60.0,
    }
    resolved = []

    def factory(model_cfg):
        resolved.append(model_cfg)
        return Synthesizer(model=_FakeModel(), warmup=False, timeout_s=60.0)

    pipe = EvaluationPipeline(cfg, language="fr", model_factory=factory)
    result = pipe.run(str(root))

    # run-id resolution: finetuned gets ids, original does not
    ids = {(c["name"], c["hours"]): c.get("llm_run_id") for c in resolved}
    assert ids[("full_finetuned", 50)] == "50-averaged-bl-FR"
    assert ids[("pretrained", 50)] is None

    res = tmp_path / "results"
    assert (res / "combined_fr.csv").exists()
    assert (res / "component_analysis.csv").exists()
    assert (res / "duration_analysis.csv").exists()
    assert (res / "evaluation_report.md").exists()
    assert (res / "full_finetuned_100h_fr.csv").exists()
    assert len(result["duration"]) == 2  # one row per hours
    assert all(r["success_rate"] == 1.0 for r in result["component"])

    out = report.generate_all(str(res), language="fr")
    assert out["charts"], "no charts written"
    import json

    payload = json.loads(open(out["charts"][0]).read())
    assert payload["labels"] and payload["datasets"][0]["data"]
    assert os.path.exists(out["tables"])


def test_pipeline_timeout_rows(tmp_path):
    """A hung synthesis becomes a failure row; the run continues."""
    import time as _time

    from cosyvoice2_eu_tpu.eval.synthesizer import Synthesizer

    class _Slow(_FakeModel):
        def tts(self, text, prompt, **kw):
            if "slow" in text:
                _time.sleep(1.0)
            return super().tts(text, prompt, **kw)

    syn = Synthesizer(model=_Slow(), warmup=False, timeout_s=0.2)
    wav_path = str(tmp_path / "p.wav")
    _write_wav(wav_path, _sine(220))
    rows = syn.synthesize_batch(
        [("a", "slow one", wav_path), ("b", "fast", wav_path)]
    )
    assert "error" in rows[0] and "timeout" in rows[0]["error"]
    assert "wav" in rows[1]


def test_metrics_smoke_mode():
    from cosyvoice2_eu_tpu.eval.metrics import test_metrics as tm

    assert tm()["ok"]

def test_true_mcd_sine_smoke_matches_reference_expectations():
    """The reference's own smoke (metrics_computer.py:689-709): detuned+noised
    sine pair yields single-digit/low-double-digit dB, not hundreds; identical
    signals yield ~0."""
    out = M.test_metrics()
    assert out["ok"], out


def test_sp2mc_alpha_zero_is_plain_cepstrum():
    """freqt with alpha=0 must be the identity on low quefrencies, so sp2mc
    reduces to the plain real cepstrum of the log power spectrum."""
    rng = np.random.default_rng(0)
    n_bins = 129
    log_sp = rng.standard_normal(n_bins) * 0.3
    sp = np.exp(log_sp)[None]
    mc = M.sp2mc(sp, order=12, alpha=0.0)[0]
    c = np.fft.irfft(np.log(sp[0]))
    c[0] /= 2.0
    np.testing.assert_allclose(mc, c[:13], atol=1e-10)


def test_sp2mc_known_cosine_log_spectrum():
    """log sp(w) = 2 cos(w k0) has cepstrum delta at quefrency k0."""
    n_fft = 256
    w = np.arange(n_fft // 2 + 1) * 2 * np.pi / n_fft
    log_sp = 2.0 * np.cos(3 * w)
    mc = M.sp2mc(np.exp(log_sp)[None], order=8, alpha=0.0)[0]
    expect = np.zeros(9)
    expect[3] = 1.0  # irfft splits the 2cos into +/- quefrency 3 (1.0 each)
    np.testing.assert_allclose(mc, expect, atol=1e-10)


def test_cheaptrick_envelope_tracks_colored_noise():
    """Envelope of AR(1)-colored noise follows the filter magnitude: MCD of
    two independent draws through the SAME filter is small; through DIFFERENT
    filters it is larger."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(1)
    sr = 16000
    n = sr  # 1 s
    a1 = lfilter([1.0], [1.0, -0.9], rng.normal(0, 0.1, n)).astype(np.float32)
    a2 = lfilter([1.0], [1.0, -0.9], rng.normal(0, 0.1, n)).astype(np.float32)
    b = lfilter([1.0], [1.0, 0.9], rng.normal(0, 0.1, n)).astype(np.float32)
    same_filter = M.mcd(a1, a2, sr)
    diff_filter = M.mcd(a1, b, sr)
    assert 0.0 < same_filter < 8.0
    assert diff_filter > same_filter


def test_wer_normalizer_matches_reference_rules():
    """Reference _normalize_for_wer semantics (metrics_computer.py:104-146):
    thousands separators removed, decimal comma folded, ligature/ss maps,
    hyphen/apostrophe as separators, diacritics stripped."""
    n = M.normalize_text_for_wer
    assert n("C'était 1 234,5 € — vraiment !", "fr") == "c etait 1234 5 vraiment"
    assert n("Die Straße Nr. 1.000", "de") == "die strasse nr 1000"
    assert n("œuvre cœur", "fr") == "oeuvre coeur"
    assert n("1 234,5 mètres", "fr") == "1234 5 metres"
    assert n("Vingt-trois, s'il vous plaît", "fr") == "vingt trois s il vous plait"
