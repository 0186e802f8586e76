"""Objective evaluation metrics.

Re-expression of the reference MetricsComputer
(reference: evaluation/metrics_computer.py:189): MCD-style spectral distance
with DTW alignment (:240-310), pitch metrics GPE / F0-RMSE / F0-corr / VUV
with voiced-coverage guards (:535-633), SECS speaker cosine via CAM++
(:474-531), RTF (run_evaluation_pipeline.py:266-274), and a WER hook (the
reference transcribes with whisper large-v3 — pluggable here since the build
image has no ASR weights).

All metrics are host-side numpy; the estimators they depend on (mel, F0,
x-vector) come from this framework's own implementations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


# ---------------------------------------------------------------------------
# alignment
# ---------------------------------------------------------------------------

def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Classic DTW over a (T1, T2) local-cost matrix; returns aligned index
    arrays."""
    t1, t2 = cost.shape
    acc = np.full((t1 + 1, t2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        j0 = 1
        prev = acc[i - 1]
        cur = acc[i]
        for j in range(j0, t2 + 1):
            cur[j] = cost[i - 1, j - 1] + min(prev[j], cur[j - 1], prev[j - 1])
    # backtrack
    i, j = t1, t2
    path_i, path_j = [], []
    while i > 0 and j > 0:
        path_i.append(i - 1)
        path_j.append(j - 1)
        moves = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        k = int(np.argmin(moves))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(path_i[::-1]), np.asarray(path_j[::-1])


# ---------------------------------------------------------------------------
# spectral distance (MCD-style on mel cepstra)
# ---------------------------------------------------------------------------

def _np_stft_power(wav: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(frames, bins) power spectrogram — numpy-pure so metrics never touch
    the accelerator (per-sample host math; TPU dispatch would recompile per
    audio length)."""
    pad = (n_fft - hop) // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n = 1 + (len(x) - n_fft) // hop
    if n < 1:
        return np.zeros((0, n_fft // 2 + 1), np.float32)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    frames = x[idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(np.float32)


def _mel_cepstrum(wav: np.ndarray, sr: int, n_coef: int = 13) -> np.ndarray:
    from cosyvoice2_eu_tpu.ops.mel import mel_filterbank

    power = _np_stft_power(wav, 1920, 480)  # (T, 961)
    basis = mel_filterbank(sr, 1920, 80, fmin=0.0, fmax=None)  # (80, 961)
    mel = np.log(np.clip(power @ np.asarray(basis).T, 1e-5, None))  # (T, 80)
    # DCT-II over mel bins -> cepstra; drop c0 (energy), keep c1..c12 like the
    # reference's pysptk mcep usage (metrics_computer.py:240-310)
    from scipy.fft import dct

    cep = dct(mel, type=2, norm="ortho")[:, :n_coef]
    return cep[:, 1:]


def mcd(ref_wav: np.ndarray, gen_wav: np.ndarray, sr: int = 24000) -> float:
    """Mel-cepstral distance in dB with DTW alignment."""
    c_ref = _mel_cepstrum(ref_wav, sr)
    c_gen = _mel_cepstrum(gen_wav, sr)
    if len(c_ref) < 2 or len(c_gen) < 2:
        return float("nan")
    cost = np.sqrt(
        np.sum((c_ref[:, None, :] - c_gen[None, :, :]) ** 2, axis=-1)
    )
    pi, pj = dtw_path(cost)
    diff = c_ref[pi] - c_gen[pj]
    k = 10.0 / np.log(10.0) * np.sqrt(2.0)
    return float(k * np.mean(np.sqrt(np.sum(diff**2, axis=-1))))


def log_spectral_distance(ref_wav: np.ndarray, gen_wav: np.ndarray, sr: int = 24000) -> float:
    """LSD fallback (metrics_computer.py:313-360)."""
    n = min(len(ref_wav), len(gen_wav))
    r = np.log10(_np_stft_power(ref_wav[:n], 1024, 256) + 1e-10)
    g = np.log10(_np_stft_power(gen_wav[:n], 1024, 256) + 1e-10)
    return float(np.mean(np.sqrt(np.mean((r - g) ** 2, axis=-1))))


# ---------------------------------------------------------------------------
# pitch metrics
# ---------------------------------------------------------------------------

@dataclass
class PitchMetrics:
    gpe: float  # gross pitch error (%)
    f0_rmse: float  # Hz, on voiced-voiced aligned frames
    f0_corr: float
    vuv_error: float  # (%)


def pitch_metrics(ref_wav: np.ndarray, gen_wav: np.ndarray, sr: int = 24000) -> PitchMetrics:
    from cosyvoice2_eu_tpu.train.pitch import estimate_f0

    f0_r = estimate_f0(ref_wav, sr)
    f0_g = estimate_f0(gen_wav, sr)
    if (f0_r > 0).sum() < 5 or (f0_g > 0).sum() < 5:
        return PitchMetrics(float("nan"), float("nan"), float("nan"), float("nan"))

    # DTW on log-f0 contours (voiced frames -> values, unvoiced -> 0 cost band)
    lr = np.where(f0_r > 0, np.log(np.maximum(f0_r, 1)), 0.0)
    lg = np.where(f0_g > 0, np.log(np.maximum(f0_g, 1)), 0.0)
    cost = np.abs(lr[:, None] - lg[None, :])
    pi, pj = dtw_path(cost)
    r, g = f0_r[pi], f0_g[pj]

    vr, vg = r > 0, g > 0
    vuv = float(np.mean(vr != vg) * 100.0)
    both = vr & vg
    if both.sum() < 5:
        return PitchMetrics(float("nan"), float("nan"), float("nan"), vuv)
    rb, gb = r[both], g[both]
    gpe = float(np.mean(np.abs(gb - rb) > 0.2 * rb) * 100.0)
    rmse = float(np.sqrt(np.mean((gb - rb) ** 2)))
    corr = float(np.corrcoef(rb, gb)[0, 1]) if len(rb) > 1 else float("nan")
    return PitchMetrics(gpe, rmse, corr, vuv)


# ---------------------------------------------------------------------------
# speaker similarity
# ---------------------------------------------------------------------------

def secs(
    ref_wav_16k: np.ndarray,
    gen_wav_16k: np.ndarray,
    embed_fn: Callable[[np.ndarray], np.ndarray],
) -> float:
    """Speaker-embedding cosine similarity (metrics_computer.py:474-531);
    embed_fn is the CAM++ forward (models/campplus.py) or any x-vector."""
    e1 = np.asarray(embed_fn(ref_wav_16k)).ravel()
    e2 = np.asarray(embed_fn(gen_wav_16k)).ravel()
    return float(np.dot(e1, e2) / (np.linalg.norm(e1) * np.linalg.norm(e2) + 1e-12))


def wer(ref_text: str, hyp_text: str) -> float:
    """Word error rate via Levenshtein distance (jiwer equivalent)."""
    r, h = ref_text.split(), hyp_text.split()
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    return float(d[-1, -1] / max(len(r), 1))


def normalize_text_for_wer(text: str, lang: str = "fr") -> str:
    """Language-aware normalization incl. diacritics folding
    (metrics_computer.py:104-146)."""
    import re
    import unicodedata

    text = text.lower()
    text = unicodedata.normalize("NFD", text)
    text = "".join(c for c in text if unicodedata.category(c) != "Mn")
    text = re.sub(r"[^\w\s']", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def test_metrics() -> dict:
    """Sine-pair smoke test (the reference's test_metrics,
    evaluation/metrics_computer.py:689): identical signals score near-perfect;
    detuned signals degrade in the expected direction."""
    sr = 24000
    t = np.arange(sr * 2) / sr
    a = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    b = (0.5 * np.sin(2 * np.pi * 233 * t)).astype(np.float32)

    same = {
        "mcd": mcd(a, a, sr),
        "lsd": log_spectral_distance(a, a, sr),
        "f0_corr": pitch_metrics(a, a, sr).f0_corr,
    }
    diff = {
        "mcd": mcd(a, b, sr),
        "lsd": log_spectral_distance(a, b, sr),
    }
    ok = (
        same["mcd"] < 1e-3
        and same["lsd"] < 1e-3
        and diff["mcd"] > same["mcd"]
        and diff["lsd"] > same["lsd"]
        and same["f0_corr"] > 0.9
    )
    out = {"ok": bool(ok), "identical": same, "detuned": diff}
    print(out)
    return out
