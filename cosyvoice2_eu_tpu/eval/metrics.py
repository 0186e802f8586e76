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

def _pairwise_l2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(T1, d), (T2, d) -> float32 (T1, T2) Euclidean distances via one GEMM
    (no (T1, T2, d) broadcast: long utterances would blow memory)."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    d2 = (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2.0 * (a @ b.T)
    return np.sqrt(np.maximum(d2, 0.0))


def dtw_path(cost: np.ndarray, band: int | None = None
             ) -> tuple[np.ndarray, np.ndarray]:
    """Classic DTW over a (T1, T2) local-cost matrix; returns aligned index
    arrays.  `band` restricts to a slope-normalized Sakoe-Chiba band so long
    sequences stay tractable (exact full DTW when None)."""
    t1, t2 = cost.shape
    acc = np.full((t1 + 1, t2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        if band is None:
            lo, hi = 1, t2
        else:
            center = i * t2 / t1
            lo = max(1, int(center - band))
            hi = min(t2, int(center + band))
        prev = acc[i - 1]
        cur = acc[i]
        for j in range(lo, hi + 1):
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


def mcd_rel(ref_wav: np.ndarray, gen_wav: np.ndarray, sr: int = 24000) -> float:
    """RELATIVE mel-cepstral distance (DCT of log-mel, DTW-aligned).

    NOT the WORLD/pysptk MCD — cepstra come from an 80-bin log-mel DCT, so
    absolute values are NOT comparable with published MCD dB numbers (use
    :func:`mcd` for those).  Kept because it needs no envelope estimation and
    is monotone in spectral mismatch, useful for A/B deltas within one run.
    """
    c_ref = _mel_cepstrum(ref_wav, sr)
    c_gen = _mel_cepstrum(gen_wav, sr)
    if len(c_ref) < 2 or len(c_gen) < 2:
        return float("nan")
    cost = _pairwise_l2(c_ref, c_gen)
    pi, pj = dtw_path(cost, band=_dtw_band(len(c_ref), len(c_gen)))
    diff = c_ref[pi] - c_gen[pj]
    k = 10.0 / np.log(10.0) * np.sqrt(2.0)
    return float(k * np.mean(np.sqrt(np.sum(diff**2, axis=-1))))


# ---------------------------------------------------------------------------
# true MCD in dB: WORLD-style CheapTrick envelope + SPTK warped cepstrum
# ---------------------------------------------------------------------------
#
# The reference computes MCD from pyworld.cheaptrick spectral envelopes
# converted by pysptk.sp2mc (alpha 0.58 @ 16 kHz, order 12), c1..c12, DTW,
# constant 10*sqrt(2)/ln(10) (metrics_computer.py:238-310).  Neither pyworld
# nor pysptk ships in this image, so both algorithms are implemented here
# from their published descriptions: CheapTrick (Morise, 2015: F0-adaptive
# Hanning window, sub-F0 DC correction, 2F0/3 rectangular smoothing, sinc +
# q1=-0.15 cepstral liftering) and the Oppenheim frequency-transform
# recursion used by SPTK's freqt.  F0 comes from this framework's YIN
# (train/pitch.py) instead of DIO+StoneMask; CheapTrick only uses F0 to set
# smoothing bandwidths, so envelope (and MCD) sensitivity to the estimator
# choice is small.

_CHEAPTRICK_F0_FLOOR = 71.0
_CHEAPTRICK_DEFAULT_F0 = 500.0  # WORLD's kDefaultF0 for unvoiced frames
_CHEAPTRICK_Q1 = -0.15


def _cheaptrick_fft_size(fs: int) -> int:
    return 2 ** int(np.ceil(np.log2(3.0 * fs / _CHEAPTRICK_F0_FLOOR + 1.0)))


def _dc_correction(ps: np.ndarray, f0: float, fs: int, fft_size: int) -> np.ndarray:
    """Mirror spectral power below F0 so the envelope holds toward DC."""
    n = fft_size // 2 + 1
    freq = np.arange(n) * fs / fft_size
    low = freq < f0
    if not low.any():
        return ps
    mirror = np.interp(f0 - freq[low], freq, ps)
    out = ps.copy()
    out[low] += mirror
    return out


def _linear_smoothing(ps: np.ndarray, width: float, fs: int, fft_size: int) -> np.ndarray:
    """Rectangular smoothing of the power spectrum over `width` Hz, with the
    spectrum mirrored around DC (negative frequencies) like WORLD does."""
    n = fft_size // 2 + 1
    df = fs / fft_size
    freq = np.arange(n) * df
    # mirrored extension for f < 0
    ext_freq = np.concatenate([-freq[1:][::-1], freq])
    ext_ps = np.concatenate([ps[1:][::-1], ps])
    # cumulative integral with trapezoid on the uniform grid
    cum = np.concatenate([[0.0], np.cumsum((ext_ps[1:] + ext_ps[:-1]) * 0.5 * df)])
    # integral of ps over [f - w/2, f + w/2] via interpolation of the cumsum
    def integral(x):
        return np.interp(x, ext_freq, cum)

    lo = freq - width / 2.0
    hi = freq + width / 2.0
    return (integral(hi) - integral(lo)) / width


def _cheaptrick_frame(
    y: np.ndarray, center: int, f0: float, fs: int, fft_size: int
) -> np.ndarray:
    """Single-frame CheapTrick power envelope (length fft_size//2+1)."""
    half = int(1.5 * fs / f0 + 0.5)
    base = np.arange(-half, half + 1)
    idx = np.clip(center + base, 0, len(y) - 1)
    w = 0.5 * np.cos(np.pi * base * f0 / (1.5 * fs)) + 0.5
    seg = y[idx] * w
    # weighted DC removal (WORLD GetWindowedWaveform)
    seg = seg - w * (seg.sum() / w.sum())
    spec = np.fft.rfft(seg, fft_size)
    ps = (spec.real**2 + spec.imag**2).astype(np.float64)
    # relative floor, WORLD's AddInfinitesimalNoise analog: keeps log-envelope
    # differences bounded on digitally-silent bands (pure tones, padding)
    ps = np.maximum(ps, ps.max() * 1e-12 + 1e-30)
    ps = _dc_correction(ps, f0, fs, fft_size)
    ps = _linear_smoothing(ps, 2.0 * f0 / 3.0, fs, fft_size)
    # cepstral liftering with recovery (SmoothingWithRecovery)
    log_ps = np.log(ps + 1e-30)
    cep = np.fft.irfft(log_ps)  # length fft_size, symmetric
    tau = np.arange(fft_size)
    tau = np.minimum(tau, fft_size - tau)  # two-sided quefrency
    arg = np.pi * f0 * tau / fs
    smoothing = np.where(tau == 0, 1.0, np.sin(np.maximum(arg, 1e-12)) / np.maximum(arg, 1e-12))
    compensation = (1.0 - 2.0 * _CHEAPTRICK_Q1) + 2.0 * _CHEAPTRICK_Q1 * np.cos(
        2.0 * np.pi * f0 * tau / fs
    )
    cep = cep * smoothing * compensation
    return np.exp(np.fft.rfft(cep).real)


def cheaptrick_envelope(
    wav: np.ndarray, f0: np.ndarray, fs: int, hop: int, fft_size: int | None = None
) -> np.ndarray:
    """(T_frames, fft//2+1) power spectral envelope; f0 per frame (0 = unvoiced)."""
    if fft_size is None:
        fft_size = _cheaptrick_fft_size(fs)
    out = np.empty((len(f0), fft_size // 2 + 1))
    for i, f in enumerate(f0):
        cur = float(f) if f > _CHEAPTRICK_F0_FLOOR else _CHEAPTRICK_DEFAULT_F0
        out[i] = _cheaptrick_frame(wav, i * hop, cur, fs, fft_size)
    return out


def _freqt(c: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Oppenheim all-pass frequency transform (SPTK freqt) over a batch:
    c is (T, N) linear-frequency cepstra -> (T, order+1) warped cepstra."""
    t = c.shape[0]
    beta = 1.0 - alpha * alpha
    d = np.zeros((t, order + 1))
    for i in range(c.shape[1] - 1, -1, -1):
        prev = d
        d = np.empty_like(prev)
        d[:, 0] = c[:, i] + alpha * prev[:, 0]
        if order >= 1:
            d[:, 1] = beta * prev[:, 0] + alpha * prev[:, 1]
        for m in range(2, order + 1):
            d[:, m] = prev[:, m - 1] + alpha * (prev[:, m] - d[:, m - 1])
    return d


def sp2mc(sp: np.ndarray, order: int = 12, alpha: float = 0.58) -> np.ndarray:
    """(T, bins) power envelope -> (T, order+1) mel-cepstra (pysptk.sp2mc
    semantics: log power -> real cepstrum, c0 halved, freqt warp)."""
    log_sp = np.log(np.maximum(sp, 1e-30))
    c = np.fft.irfft(log_sp, axis=-1)
    c[:, 0] /= 2.0
    return _freqt(c, order, alpha)


def _resample_to(wav: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return np.asarray(wav, np.float64)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target)
    return resample_poly(np.asarray(wav, np.float64), target // g, sr // g)


def _dtw_band(t1: int, t2: int) -> int | None:
    """Full DTW for short pairs; 10%-of-length Sakoe-Chiba band beyond
    ~1500 frames so long utterances stay O(T*band)."""
    n = max(t1, t2)
    if n <= 1500:
        return None
    return max(96, n // 10)


_MCEP_MAX_FRAMES = 2400  # ~12 s at the 5 ms hop; longer audio widens the hop


def mcep_sequence(wav: np.ndarray, sr: int, order: int = 12) -> np.ndarray:
    """(T, order+1) WORLD-style mel-cepstrum sequence at a 5 ms hop
    (the reference's _extract_mcep_sequence, metrics_computer.py:238-257);
    the hop widens proportionally past ~12 s so frame count (and the per-
    frame python CheapTrick loop + DTW) stays bounded on long utterances."""
    from cosyvoice2_eu_tpu.train.pitch import estimate_f0

    hop = int(sr * 0.005)
    if len(wav) // hop > _MCEP_MAX_FRAMES:
        hop = int(np.ceil(len(wav) / _MCEP_MAX_FRAMES))
    frame_len = min(2048, 2 ** int(np.ceil(np.log2(sr // 25))))
    f0 = estimate_f0(
        np.asarray(wav, np.float32), sr, hop=hop, frame_len=frame_len
    )
    sp = cheaptrick_envelope(np.asarray(wav, np.float64), f0, sr, hop)
    alpha = 0.58 if sr <= 16000 else (0.65 if sr <= 22050 else 0.76)
    return sp2mc(sp, order=order, alpha=alpha)


def mcd(ref_wav: np.ndarray, gen_wav: np.ndarray, sr: int = 24000,
        order: int = 12) -> float:
    """True mel-cepstral distortion in dB — WORLD-class envelope + warped
    cepstra c1..c12, DTW alignment, 10*sqrt(2)/ln(10) constant: directly
    comparable with the reference's pyworld+pysptk numbers
    (metrics_computer.py:259-310, BASELINE.md MCD rows)."""
    target = 16000
    r = _resample_to(ref_wav, sr, target)
    g = _resample_to(gen_wav, sr, target)
    c_ref = mcep_sequence(r, target, order)[:, 1:]
    c_gen = mcep_sequence(g, target, order)[:, 1:]
    if len(c_ref) < 2 or len(c_gen) < 2:
        return float("nan")
    cost = _pairwise_l2(c_ref, c_gen)
    pi, pj = dtw_path(cost, band=_dtw_band(len(c_ref), len(c_gen)))
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


def normalize_text_for_wer(text: str, lang: str = "fr",
                           strip_accents: bool = True) -> str:
    """Language-aware ASR-style normalization matching the reference's
    _normalize_for_wer (metrics_computer.py:104-146): NFKC+lower, quote/dash
    unification, DE ss-folding / FR ligature folding, thousands-separator
    removal + decimal comma->dot, hyphen/apostrophe as separators, diacritics
    strip, punctuation drop, whitespace collapse."""
    import re
    import unicodedata

    s = unicodedata.normalize("NFKC", text).lower().strip()
    s = (s.replace("’", "'").replace("‘", "'").replace("‚", "'")
         .replace("“", '"').replace("”", '"').replace("„", '"')
         .replace("–", "-").replace("—", "-").replace("−", "-"))
    ll = (lang or "").lower()
    if ll.startswith("de"):
        s = s.replace("ß", "ss")
    if ll.startswith(("fr", "fra", "fre")):
        s = s.replace("œ", "oe").replace("æ", "ae")
    # thousands separators (dot, NBSP/NNBSP/thin/hair space, space) then
    # decimal comma -> dot, so 1 234,5 / 1.234,5 both become 1234.5
    s = re.sub(r"(?<=\d)[.\u00A0\u202F\u2009\u200A\s](?=\d{3}\b)", "", s)
    s = re.sub(r"(\d),(\d)", r"\1.\2", s)
    s = re.sub(r"[-']", " ", s)
    if strip_accents:
        s = unicodedata.normalize("NFD", s)
        s = "".join(c for c in s if unicodedata.category(c) != "Mn")
    s = re.sub(r"[^\w\s]", " ", s, flags=re.UNICODE)
    return re.sub(r"\s+", " ", s).strip()


def test_metrics() -> dict:
    """Sine-pair smoke test (the reference's test_metrics,
    evaluation/metrics_computer.py:689-709): identical signals score
    near-perfect; a detuned+noised pair degrades in the expected direction,
    and true MCD lands in the reference's documented expected range
    ("single-digit/low double-digit dB — not hundreds")."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2.0, int(sr * 2.0))
    a = (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)
    b = (np.sin(2 * np.pi * 230 * t) * 0.5 + rng.normal(0, 0.02, len(t))).astype(
        np.float32
    )

    same = {
        "mcd": mcd(a, a, sr),
        "mcd_rel": mcd_rel(a, a, sr),
        "lsd": log_spectral_distance(a, a, sr),
        "f0_corr": pitch_metrics(a, a, sr).f0_corr,
    }
    diff = {
        "mcd": mcd(a, b, sr),
        "mcd_rel": mcd_rel(a, b, sr),
        "lsd": log_spectral_distance(a, b, sr),
    }
    ok = (
        same["mcd"] < 1e-3
        and same["lsd"] < 1e-3
        and diff["mcd"] > same["mcd"]
        and 0.5 < diff["mcd"] < 30.0  # dB scale sanity, not hundreds
        and diff["lsd"] > same["lsd"]
        and same["f0_corr"] > 0.9
    )
    out = {"ok": bool(ok), "identical": same, "detuned": diff}
    print(out)
    return out
