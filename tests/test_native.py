"""Native C++ DSP library: build, load, and parity with the numpy YIN."""

import numpy as np
import pytest

from cosyvoice2_eu_tpu.utils.native import load_library, yin_f0_native


def _tone(freq, sr=24000, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_native_builds_and_tracks_pitch():
    lib = load_library()
    if lib is None:
        pytest.skip("no native toolchain")
    wav = _tone(220.0)
    f0 = yin_f0_native(wav)
    voiced = f0[f0 > 0]
    assert len(voiced) > len(f0) * 0.8
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_native_matches_numpy_fallback():
    lib = load_library()
    if lib is None:
        pytest.skip("no native toolchain")
    from cosyvoice2_eu_tpu.train import pitch

    rng = np.random.default_rng(0)
    wav = _tone(150.0, seconds=0.4) + (rng.standard_normal(9600) * 0.01).astype(np.float32)
    native = yin_f0_native(wav)

    # numpy path (bypass the native dispatch)
    import cosyvoice2_eu_tpu.utils.native as native_mod

    orig = native_mod.yin_f0_native
    try:
        native_mod.yin_f0_native = lambda *a, **k: None
        ref = pitch.estimate_f0(wav)
    finally:
        native_mod.yin_f0_native = orig

    # voiced/unvoiced decisions agree on >90% of frames; voiced values close
    both = (native > 0) & (ref > 0)
    agree = np.mean((native > 0) == (ref > 0))
    assert agree > 0.9
    if both.sum():
        np.testing.assert_allclose(native[both], ref[both], rtol=0.05)


def test_unvoiced_silence():
    lib = load_library()
    if lib is None:
        pytest.skip("no native toolchain")
    f0 = yin_f0_native(np.zeros(24000, np.float32))
    assert (f0 == 0).all()
