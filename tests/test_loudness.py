"""BS.1770 integrated-loudness measurement (`dsp/loudness.py`).

Calibration anchor: a full-scale 997 Hz sine reads -3.01 LKFS/LUFS
(ITU-R BS.1770-4 Annex 1 compliance point).
"""

import numpy as np

from voicesplit_tpu.dsp.loudness import integrated_lufs, loudness_normalize


def _sine(freq, fs, seconds, amp=1.0):
    t = np.arange(int(fs * seconds)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_fullscale_sine_calibration_48k():
    lufs = integrated_lufs(_sine(997.0, 48000, 3.0), 48000)
    assert abs(lufs - (-3.01)) < 0.1, lufs


def test_fullscale_sine_calibration_16k():
    # same anchor at the pipeline's 16 kHz (filter design is fs-general)
    lufs = integrated_lufs(_sine(997.0, 16000, 3.0), 16000)
    assert abs(lufs - (-3.01)) < 0.15, lufs


def test_gain_linearity():
    x = _sine(440.0, 16000, 2.0, amp=0.5)
    l1 = integrated_lufs(x, 16000)
    l2 = integrated_lufs(0.25 * x, 16000)
    assert abs((l1 - l2) - 20 * np.log10(4.0)) < 0.05


def test_silence_gate():
    assert integrated_lufs(np.zeros(16000, np.float32), 16000) == -70.0


def test_normalize_hits_target():
    x = _sine(300.0, 16000, 3.0, amp=0.05)
    y = loudness_normalize(x, 16000, target_lufs=-23.0)
    assert abs(integrated_lufs(y, 16000) - (-23.0)) < 0.1
    assert np.max(np.abs(y)) <= 0.995


def test_normalize_respects_peak_ceiling():
    # quiet but already peaky signal: loudness gain would clip; the
    # linear-mode fallback caps at the peak ceiling instead
    rng = np.random.default_rng(0)
    x = (0.02 * rng.standard_normal(48000)).astype(np.float32)
    x[1000] = 0.9
    y = loudness_normalize(x, 16000, target_lufs=-5.0, peak_ceiling=0.99)
    assert np.max(np.abs(y)) <= 0.99 + 1e-3
