"""Host-side F0 estimation for GAN training targets.

Replaces the reference's pyworld (WORLD harvest/dio, C++) dependency
(reference: cosy_repo/cosyvoice/dataset/processor.py:188-210) with a numpy
YIN-style estimator: frame-wise cumulative-mean-normalized difference minima
with parabolic interpolation and a voicing threshold.  Only used to produce
training targets for the HiFT F0 predictor — inference never calls this.
"""

from __future__ import annotations

import numpy as np


def estimate_f0(
    wav: np.ndarray,
    sample_rate: int = 24000,
    hop: int = 480,
    fmin: float = 60.0,
    fmax: float = 500.0,
    frame_len: int = 1920,
    threshold: float = 0.15,
) -> np.ndarray:
    """wav (T,) -> f0 (T // hop,) in Hz; 0 where unvoiced.

    Dispatches to the native C++ YIN (native/cosy_dsp.cpp) when built; the
    numpy implementation below is the reference/fallback path.
    """
    from cosyvoice2_eu_tpu.utils.native import yin_f0_native

    native = yin_f0_native(wav, sample_rate, hop, fmin, fmax, frame_len, threshold)
    if native is not None:
        return native
    tau_min = int(sample_rate / fmax)
    tau_max = int(sample_rate / fmin)
    n_frames = max(len(wav) // hop, 0)
    f0 = np.zeros(n_frames, np.float32)
    pad = np.pad(wav, (0, frame_len + tau_max))

    for i in range(n_frames):
        frame = pad[i * hop : i * hop + frame_len]
        if np.abs(frame).max() < 1e-4:
            continue
        # difference function via FFT autocorrelation
        w = frame_len
        x = frame
        x2 = np.cumsum(x * x)
        size = w + tau_max
        fft_size = 1 << int(np.ceil(np.log2(size)))
        fx = np.fft.rfft(x, fft_size)
        acf = np.fft.irfft(fx * np.conj(fx))[: tau_max + 1]
        # d(tau) = r(0) + r_tau(0) - 2*acf ~ 2*(acf[0] - acf[tau]) for stationary frames
        d = 2.0 * (acf[0] - acf)
        # cumulative mean normalization
        cmnd = np.ones_like(d)
        cumsum = np.cumsum(d[1:])
        cmnd[1:] = d[1:] * np.arange(1, len(d)) / np.maximum(cumsum, 1e-12)

        seg = cmnd[tau_min:tau_max]
        below = np.where(seg < threshold)[0]
        if len(below):
            tau = below[0] + tau_min
            # walk to the local minimum
            while tau + 1 < tau_max and cmnd[tau + 1] < cmnd[tau]:
                tau += 1
        else:
            tau = int(np.argmin(seg)) + tau_min
            if cmnd[tau] > 0.5:  # unvoiced
                continue
        # parabolic interpolation
        if 1 <= tau < tau_max - 1:
            a, b, c = cmnd[tau - 1], cmnd[tau], cmnd[tau + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            tau_f = tau + np.clip(shift, -1, 1)
        else:
            tau_f = float(tau)
        f0[i] = sample_rate / tau_f
    return f0
