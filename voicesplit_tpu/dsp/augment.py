"""Offline voice-identity augmentation: pseudo-speaker synthesis.

The round-2 open-set campaign measured the bottleneck as speaker-encoder
generalization (held-out EER 0.233 vs 0.021 seen — docs/RESULTS.md):
the demo corpus has too few IDENTITIES, not too few utterances.  Speed
perturbation (resampled playback) multiplies identities but couples
pitch and tempo — every 0.9x copy is both deeper AND slower, so the set
of "voices" it adds is one-dimensional.  This module adds the two
standard orthogonal axes (host-side numpy; corpus prep, not the jit
path):

- `pitch_shift`: pitch up/down at CONSTANT tempo — phase-vocoder time
  stretch (scipy STFT) followed by playback resampling, the classic
  librosa/sox recipe.  Changes f0 and formants together without the
  tempo tell.
- `vtlp`: vocal-tract-length perturbation (Jaitly & Hinton, ICML WDLASL
  2013) — piecewise-linear warp of the spectrogram's frequency axis,
  resynthesized with the original phase.  alpha > 1 compresses formant
  spacing (longer vocal tract, "larger" speaker); alpha < 1 the
  opposite.  Tempo AND pitch contour are untouched; only the timbre
  (formant structure) moves, which is exactly the axis a speaker
  encoder keys on.

The reference has no augmentation at all (its diversity came from 2k+
real LibriSpeech speakers, `Final Report.pdf` §2.4); these synthesize
the diversity its corpus provided for free.
"""

from __future__ import annotations

import numpy as np

# STFT geometry for the analysis/synthesis pair.  75% overlap keeps the
# phase vocoder's phase-locking artifacts low; 1024 @ 16 kHz = 64 ms
# windows, fine for speech.
_NFFT = 1024
_HOP = 256


def _stft(wav: np.ndarray):
    from scipy.signal import stft

    return stft(wav, nperseg=_NFFT, noverlap=_NFFT - _HOP, window="hann",
                padded=True)[2]


def _istft(spec: np.ndarray, length: int) -> np.ndarray:
    from scipy.signal import istft

    out = istft(spec, nperseg=_NFFT, noverlap=_NFFT - _HOP, window="hann")[1]
    out = np.asarray(out, np.float32)
    if out.shape[0] < length:
        out = np.pad(out, (0, length - out.shape[0]))
    return out[:length]


def time_stretch(wav: np.ndarray, rate: float) -> np.ndarray:
    """Phase-vocoder time stretch: output is ``len(wav) / rate`` samples
    at the same pitch (`rate` > 1 = faster/shorter).

    Standard integration: resample the STFT's time axis at `rate`,
    interpolate magnitudes, and accumulate phase from the per-bin phase
    ADVANCE between consecutive analysis frames so the instantaneous
    frequency of each partial is preserved.
    """
    wav = np.asarray(wav, np.float32)
    spec = _stft(wav)  # [F, T]
    F, T = spec.shape
    steps = np.arange(0, T - 1, rate)
    mag = np.abs(spec)
    phase = np.angle(spec)
    # expected phase advance per hop for each bin's center frequency
    omega = 2 * np.pi * np.arange(F) * _HOP / _NFFT

    lo = np.floor(steps).astype(int)
    frac = steps - lo
    m = (1.0 - frac) * mag[:, lo] + frac * mag[:, lo + 1]
    # heterodyned phase increment, wrapped to [-pi, pi)
    dphi = phase[:, lo + 1] - phase[:, lo] - omega[:, None]
    dphi -= 2 * np.pi * np.round(dphi / (2 * np.pi))
    inc = dphi + omega[:, None]
    acc = np.concatenate(
        [phase[:, lo[:1]], np.cumsum(inc[:, :-1], axis=1) + phase[:, lo[:1]]],
        axis=1,
    )
    out_len = int(round(wav.shape[0] / rate))
    return _istft(m * np.exp(1j * acc), out_len)


def pitch_shift(wav: np.ndarray, sample_rate: int, semitones: float) -> np.ndarray:
    """Shift pitch by `semitones` at constant tempo/duration."""
    from voicesplit_tpu.dsp.audio_io import resample

    factor = 2.0 ** (semitones / 12.0)  # >1 = up
    # stretch to factor x length (same pitch), then play back faster by
    # `factor` (resample): pitch x factor, duration back to original
    stretched = time_stretch(wav, rate=1.0 / factor)
    out = resample(stretched, int(round(sample_rate * factor)), sample_rate)
    n = np.asarray(wav).shape[0]
    out = np.asarray(out, np.float32)
    if out.shape[0] < n:
        out = np.pad(out, (0, n - out.shape[0]))
    return out[:n]


def vtlp(wav: np.ndarray, sample_rate: int, alpha: float,
         f_hi: float = 4800.0) -> np.ndarray:
    """Vocal-tract-length perturbation: formant-axis warp at constant
    pitch contour and tempo.

    Piecewise-linear warp (Jaitly & Hinton 2013): frequencies below the
    breakpoint scale by `alpha`; above it, a linear segment maps the
    remainder onto [.., nyquist] so the warp is a bijection.  Magnitudes
    are resampled along the warped axis; the original phase is kept
    (phase warping adds artifacts and buys nothing for a magnitude-
    driven encoder).
    """
    wav = np.asarray(wav, np.float32)
    spec = _stft(wav)
    F = spec.shape[0]
    nyq = sample_rate / 2.0
    freqs = np.linspace(0.0, nyq, F)
    bp = f_hi * min(alpha, 1.0) / alpha  # breakpoint in SOURCE frequency
    # warp(f): where each OUTPUT frequency samples the SOURCE spectrum
    warped = np.where(
        freqs < bp * alpha,
        freqs / alpha,
        nyq - (nyq - bp) * (nyq - freqs) / max(nyq - bp * alpha, 1e-6),
    )
    warped = np.clip(warped, 0.0, nyq)
    idx = warped / nyq * (F - 1)
    lo = np.floor(idx).astype(int)
    hi = np.minimum(lo + 1, F - 1)
    frac = (idx - lo)[:, None]
    mag = np.abs(spec)
    phase = np.angle(spec)
    m = (1.0 - frac) * mag[lo] + frac * mag[hi]
    return _istft(m * np.exp(1j * phase), wav.shape[0])


# --------------------------------------------------------------------------
# Train-time (on-device) input corruption — the mask-net-side overfit lever.
# Unlike the host-side pseudo-speaker synthesis above, this runs INSIDE the
# jitted train step, so it is written in jax with static shapes.


def spec_time_freq_mask(spec, key, max_time: int = 0, max_freq: int = 0,
                        n_masks: int = 2):
    """SpecAugment-style time/frequency masking (Park et al. 2019,
    arXiv:1904.08779) of a normalized magnitude spectrogram batch.

    ``spec [B, T, F]``; per item, ``n_masks`` random bands per active
    axis with widths uniform in [0, max_*] are zeroed (zero = the dB
    floor of the [0, 1]-normalized spec).  Static shapes throughout —
    widths/starts are data, not shapes, so XLA compiles this once.  The
    train step feeds the CORRUPTED spec to the mask net but multiplies
    the predicted mask with the CLEAN mixture spec (input corruption
    only; the target is untouched — `train/steps.py`).
    """
    import jax
    import jax.numpy as jnp

    B, T, F = spec.shape

    def mask_axis(s, k, length, max_w, axis):
        k1, k2 = jax.random.split(k)
        w = jax.random.randint(k1, (B, n_masks), 0, max_w + 1)
        start = jax.random.randint(k2, (B, n_masks), 0,
                                   jnp.maximum(length - w, 1))
        idx = jnp.arange(length)[None, None, :]
        hit = (idx >= start[..., None]) & (idx < (start + w)[..., None])
        keep = ~jnp.any(hit, axis=1)  # [B, length]
        shape = [B, 1, 1]
        shape[axis] = length
        return s * keep.reshape(shape).astype(s.dtype)

    kt, kf = jax.random.split(key)
    if max_time:
        spec = mask_axis(spec, kt, T, int(max_time), 1)
    if max_freq:
        spec = mask_axis(spec, kf, F, int(max_freq), 2)
    return spec
