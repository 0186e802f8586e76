"""STFT / iSTFT primitives in pure JAX.

Numerics follow torch.stft/torch.istft (used by the reference HiFT vocoder,
cosy_repo/cosyvoice/hifigan/generator.py:504-518, and the matcha mel featurizer,
third_party/Matcha-TTS/matcha/utils/audio.py:45).

Small transforms (HiFT's n_fft=16) are expressed as DFT matmuls so XLA places
them on the MXU; larger ones use jnp.fft.rfft.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# Below this size a dense DFT matmul beats FFT on TPU and fuses with
# neighbouring elementwise work.
_MATMUL_DFT_MAX = 64


def hann_window(win_size: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (scipy.signal.get_window('hann', n, fftbins=True)).

    Returned as a host numpy array: istft folds the squared-window OLA
    envelope at trace time, so the window must stay concrete.
    """
    n = np.arange(win_size)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    return np.asarray(w).astype(dtype)


def frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length).

    When hop divides frame_length (both HiFT's 16/4 and the mel 1920/480),
    framing is reshape + r shifted slices + concat — no gather.  TPU gathers
    serialize; the gather form made the HiFT head scale with n_frames and
    dominated vocoder time."""
    T = x.shape[-1]
    n_frames = 1 + (T - frame_length) // hop
    if frame_length % hop == 0:
        r = frame_length // hop
        usable = n_frames + r - 1
        blocks = x[..., : usable * hop].reshape(x.shape[:-1] + (usable, hop))
        parts = [blocks[..., j : j + n_frames, :] for j in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real/imag DFT analysis matrices, shape (n_fft, n_fft//2+1)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _reflect_pad_last(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch.stft-compatible (onesided).  x: (..., T).

    Returns (real, imag) each (..., n_fft//2+1, n_frames).
    """
    if center:
        x = _reflect_pad_last(x, n_fft // 2)
    frames = frame(x, n_fft, hop) * window  # (..., n_frames, n_fft)
    if n_fft <= _MATMUL_DFT_MAX:
        cos_m, sin_m = _dft_matrices(n_fft)
        real = frames @ jnp.asarray(cos_m)
        imag = frames @ jnp.asarray(sin_m)
    else:
        spec = jnp.fft.rfft(frames, axis=-1)
        real, imag = jnp.real(spec), jnp.imag(spec)
    # move freq before time to match torch's (..., F, T) layout
    return jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = True,
) -> jnp.ndarray:
    """torch.istft-compatible overlap-add.  real/imag: (..., F, n_frames).

    Returns (..., hop * (n_frames - 1)) when center=True (torch default trim).
    """
    real = jnp.swapaxes(real, -1, -2)  # (..., n_frames, F)
    imag = jnp.swapaxes(imag, -1, -2)
    if n_fft <= _MATMUL_DFT_MAX:
        cos_m, sin_m = _dft_matrices(n_fft)
        # irfft via the conjugate-symmetric expansion: weight interior bins 2x
        w = np.full(n_fft // 2 + 1, 2.0, dtype=np.float32)
        w[0] = 1.0
        if n_fft % 2 == 0:
            w[-1] = 1.0
        # sin_m holds sin(-2*pi*n*k/N), so "+" here implements Re*cos - Im*sin
        frames = (real * w) @ jnp.asarray(cos_m.T) + (imag * w) @ jnp.asarray(sin_m.T)
        frames = frames / n_fft
    else:
        frames = jnp.fft.irfft(real + 1j * imag, n=n_fft, axis=-1)
    frames = frames * window  # synthesis window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    if n_fft % hop == 0:
        # scatter-free overlap-add: split frames into hop-blocks and sum r
        # shifted slabs (TPU scatters serialize; this is pure pad + add)
        r = n_fft // hop
        fr = flat.reshape(flat.shape[0], n_frames, r, hop)
        sig_blocks = jnp.zeros((flat.shape[0], n_frames + r - 1, hop), flat.dtype)
        for j in range(r):
            sig_blocks = sig_blocks + jnp.pad(
                fr[:, :, j, :], ((0, 0), (j, r - 1 - j), (0, 0))
            )
        sig = sig_blocks.reshape(flat.shape[0], out_len)
    else:
        # overlap-add via scatter-add over static indices
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        idx_flat = jnp.asarray(idx.reshape(-1))
        sig = jnp.zeros((flat.shape[0], out_len), flat.dtype)
        sig = sig.at[:, idx_flat].add(flat.reshape(flat.shape[0], -1))

    # window envelope normalization (NOLA); window must be host-concrete
    wsq = np.zeros(out_len, dtype=np.float32)
    w2 = np.square(np.asarray(window, dtype=np.float32))
    for f in range(n_frames):
        wsq[f * hop : f * hop + n_fft] += w2
    sig = sig / jnp.asarray(np.maximum(wsq, 1e-11))

    if center:
        sig = sig[:, n_fft // 2 : out_len - n_fft // 2]
    return sig.reshape(batch_shape + (sig.shape[-1],))
