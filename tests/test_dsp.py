"""DSP golden tests.

torch.stft/torch.istft (a fully independent FFT implementation) serve as
the golden reference for the librosa conventions the reference framework
uses; round-trip tests pin reconstruction quality at the exact
voicefilter-backend parameters (n_fft 1200 / hop 160 / win 400 @ 16 kHz).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from voicesplit_tpu.config import AudioConfig
from voicesplit_tpu.dsp import (
    amp_to_db,
    db_to_amp,
    denormalize_db,
    frame_signal,
    get_window,
    istft,
    mel_filterbank,
    normalize_db,
    num_frames,
    overlap_add,
    stft,
)
from voicesplit_tpu.dsp.normalize import inv_preemphasis, preemphasis
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.dsp.stft import stft_magphase, istft_magphase

N_FFT, HOP, WIN, SR = 1200, 160, 400, 16000


def _signal(n=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    y = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1313 * t + 0.7)
        + 0.05 * rng.standard_normal(n)
    )
    return y.astype(np.float32)


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


def test_hann_periodic_matches_torch():
    np.testing.assert_allclose(
        get_window("hann", 400), torch.hann_window(400, periodic=True).numpy(), atol=1e-6
    )


def test_hamming_symmetric_matches_torch():
    np.testing.assert_allclose(
        get_window("hamming", 400),
        torch.hamming_window(400, periodic=False).numpy(),
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# STFT vs torch golden
# ---------------------------------------------------------------------------


def test_stft_matches_torch():
    y = _signal()
    re, im = stft(jnp.asarray(y), N_FFT, HOP, WIN)
    ref = torch.stft(
        torch.from_numpy(y),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()  # [F, T]
    assert re.shape == (ref.shape[1], ref.shape[0])  # ours is [T, F]
    np.testing.assert_allclose(np.asarray(re).T, ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im).T, ref.imag, atol=2e-3, rtol=1e-4)


def test_num_frames():
    assert num_frames(48000, N_FFT, HOP) == 301
    y = _signal()
    re, _ = stft(jnp.asarray(y), N_FFT, HOP, WIN)
    assert re.shape == (301, 601)


def test_stft_batched():
    y = np.stack([_signal(seed=1), _signal(seed=2)])
    re, im = stft(jnp.asarray(y), N_FFT, HOP, WIN)
    assert re.shape == (2, 301, 601)
    re0, _ = stft(jnp.asarray(y[0]), N_FFT, HOP, WIN)
    np.testing.assert_allclose(np.asarray(re[0]), np.asarray(re0), atol=1e-5)


# ---------------------------------------------------------------------------
# Overlap-add / iSTFT
# ---------------------------------------------------------------------------


def test_overlap_add_exact():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((3, 7, N_FFT)).astype(np.float32)
    out = np.asarray(overlap_add(jnp.asarray(frames), HOP))
    expected = np.zeros((3, 6 * HOP + N_FFT), np.float32)
    for t in range(7):
        expected[:, t * HOP : t * HOP + N_FFT] += frames[:, t]
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_istft_matches_torch():
    y = _signal()
    re, im = stft(jnp.asarray(y), N_FFT, HOP, WIN)
    rec = istft(re, im, N_FFT, HOP, WIN)
    spec = torch.from_numpy(np.asarray(re).T + 1j * np.asarray(im).T)
    ref = torch.istft(
        spec,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN, periodic=True),
        center=True,
    ).numpy()
    n = min(len(ref), rec.shape[-1])
    np.testing.assert_allclose(np.asarray(rec)[:n], ref[:n], atol=2e-3)


def test_roundtrip_reconstruction():
    y = _signal()
    re, im = stft(jnp.asarray(y), N_FFT, HOP, WIN)
    rec = np.asarray(istft(re, im, N_FFT, HOP, WIN, length=len(y)))
    # interior (edges lose energy to window taper)
    err = np.abs(rec[2000:-2000] - y[2000:-2000])
    assert err.max() < 5e-3, err.max()


def test_roundtrip_hamming_synthesis():
    """Mismatched hann-analysis/hamming-synthesis (the reference's training
    path) still reconstructs closely — sanity for the parity option."""
    y = _signal()
    mag, phase = stft_magphase(jnp.asarray(y), N_FFT, HOP, WIN)
    rec = np.asarray(
        istft_magphase(mag, phase, N_FFT, HOP, WIN, window="hamming", length=len(y))
    )
    seg, ref = rec[2000:-2000], y[2000:-2000]
    snr = 10 * np.log10(np.sum(ref**2) / np.sum((seg - ref) ** 2))
    assert snr > 25, snr


# ---------------------------------------------------------------------------
# Normalization semantics (reference utils/audio_processor.py:537-547)
# ---------------------------------------------------------------------------


def test_amp_db_roundtrip():
    x = jnp.asarray(np.logspace(-4, 2, 50), jnp.float32)
    np.testing.assert_allclose(np.asarray(db_to_amp(amp_to_db(x))), np.asarray(x), rtol=1e-4)


def test_amp_to_db_floor():
    assert np.isclose(float(amp_to_db(jnp.asarray(0.0))), -100.0)


def test_normalize_denormalize():
    S = jnp.asarray(np.linspace(-150, 30, 100), jnp.float32)
    norm = normalize_db(S)
    assert float(norm.min()) >= 0.0 and float(norm.max()) <= 1.0
    # in-range values roundtrip
    S2 = jnp.asarray(np.linspace(-99, -1, 50), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(denormalize_db(normalize_db(S2))), np.asarray(S2), atol=1e-3
    )


def test_preemphasis_roundtrip():
    y = jnp.asarray(_signal(8000))
    rec = inv_preemphasis(preemphasis(y, 0.97), 0.97)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(y), atol=1e-3)


def test_preemphasis_matches_scipy():
    import scipy.signal

    y = _signal(4000)
    ours = np.asarray(preemphasis(jnp.asarray(y), 0.97))
    ref = scipy.signal.lfilter([1, -0.97], [1], y)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ours_inv = np.asarray(inv_preemphasis(jnp.asarray(y), 0.97))
    ref_inv = scipy.signal.lfilter([1], [1, -0.97], y)
    np.testing.assert_allclose(ours_inv, ref_inv, atol=1e-2, rtol=1e-3)


# ---------------------------------------------------------------------------
# Mel filterbank properties (librosa Slaney conventions)
# ---------------------------------------------------------------------------


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR, N_FFT, 40)
    assert fb.shape == (40, 601)
    assert (fb >= 0).all()
    # every filter has support; filters tile the band
    assert (fb.sum(axis=1) > 0).all()
    # Slaney-normalized: equal-area ≈ constant row integral in Hz
    df = SR / 2 / 600
    areas = fb.sum(axis=1) * df
    assert np.all(np.abs(areas - 1.0) < 0.35), areas


def test_mel_center_frequencies_monotonic():
    fb = mel_filterbank(SR, N_FFT, 40)
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()
    # linear region below 1 kHz: first filters evenly spaced
    hz = peaks * (SR / 2) / 600
    spacing = np.diff(hz[:5])
    assert np.all(np.abs(spacing - spacing.mean()) < 0.6 * spacing.mean())


# ---------------------------------------------------------------------------
# Processor facade
# ---------------------------------------------------------------------------


def test_processor_wav2spec_shapes():
    ap = AudioProcessor(AudioConfig())
    y = _signal()
    spec, phase = ap.wav2spec(y)
    assert spec.shape == (301, 601)
    assert phase.shape == (301, 601)
    assert spec.min() >= 0.0 and spec.max() <= 1.0


def test_processor_mixed_phase_inversion_snr():
    """wav → spec → wav with true phase recovers the signal well (the
    eval path, reference `utils/generic_utils.py:504`).

    The signal is scaled so spectrogram peaks stay below the 0 dB clip of
    `normalize_db` (the reference clips there too — `utils/
    audio_processor.py:543-544`); louder content saturates by design.
    """
    ap = AudioProcessor(AudioConfig())
    y = _signal() * 0.01
    spec, phase = ap.wav2spec(y)
    rec = ap.spec2wav(spec, phase)
    n = min(len(rec), len(y))
    seg, ref = rec[2000 : n - 2000], y[2000 : n - 2000]
    snr = 10 * np.log10(np.sum(ref**2) / np.sum((seg - ref) ** 2))
    assert snr > 25, snr


def test_processor_get_mel_shape():
    ap = AudioProcessor(AudioConfig())
    mel = ap.get_mel(_signal())
    assert mel.shape == (40, 301)


def test_processor_griffin_lim_runs():
    cfg = AudioConfig()
    cfg.voicefilter.griffin_lim_iters = 4
    ap = AudioProcessor(cfg)
    y = _signal(16000)
    spec, _ = ap.wav2spec(y)
    rec = ap.spec2wav(spec)  # no phase → Griffin-Lim
    assert rec.shape[-1] > 0
    assert np.isfinite(rec).all()


def test_wavernn_backend_spectrogram():
    cfg = AudioConfig(backend="wavernn")
    ap = AudioProcessor(cfg)
    y = _signal()
    spec, phase = ap.wav2spec(y)
    T = num_frames(len(y), ap.n_fft, ap.hop_length)
    assert spec.shape == (T, 1025)
    assert spec.min() >= 0.0 and spec.max() <= 1.0


def test_waveglow_backend_spectrogram():
    cfg = AudioConfig(backend="waveglow")
    ap = AudioProcessor(cfg)
    y = _signal()
    spec, phase = ap.wav2spec(y)
    T = num_frames(len(y), ap.n_fft, ap.hop_length)
    assert spec.shape == (T, 513)


def test_istft_length_pads_to_exact_request():
    """`length` must return EXACTLY that many samples (librosa/torch
    semantics): lengths off the hop grid used to come back short, which
    broke downstream length-sliced SI-SNR on odd-length clips."""
    from voicesplit_tpu.dsp.stft import istft, stft

    rng = np.random.default_rng(0)
    for L in (252, 1000, 1001, 4321):
        y = rng.standard_normal(L).astype(np.float32)
        re, im = stft(jnp.asarray(y), n_fft=64, hop_length=21, win_length=64)
        out = istft(re, im, n_fft=64, hop_length=21, win_length=64, length=L)
        assert out.shape[-1] == L, (L, out.shape)
        # interior reconstruction still accurate
        np.testing.assert_allclose(np.asarray(out)[32:L - 64], y[32:L - 64], atol=1e-4)
