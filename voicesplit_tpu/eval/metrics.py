"""Separation quality metrics.

- `bss_eval_sdr` — the BSS_EVAL v3 SDR for the single-target case, the
  quantity the reference reports via
  ``mir_eval.separation.bss_eval_sources`` (`utils/generic_utils.py:509`).
  Reimplemented from the published definition (Vincent et al. 2006): the
  estimate is decomposed against a 512-tap least-squares projection onto
  delayed copies of the reference signal; SDR = energy ratio of the
  projection vs the residual.  Host-side numpy/scipy (it is an eval-only
  metric; the reference also runs it on CPU).
- `si_snr_improvement` — SI-SNRi: SI-SNR(estimate, target) −
  SI-SNR(mixture, target), the headline number of BASELINE.md.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import scipy.signal


def _projection_sdr(reference: np.ndarray, estimate: np.ndarray, filt_len: int = 512) -> float:
    """SDR of `estimate` against the span of `reference` delayed 0..L-1."""
    n = min(len(reference), len(estimate))
    s = np.asarray(reference[:n], np.float64)
    y = np.asarray(estimate[:n], np.float64)

    # autocorrelation of s (first filt_len lags) and cross-correlation y·s
    n_fft = int(2 ** np.ceil(np.log2(n + filt_len)))
    S = np.fft.rfft(s, n_fft)
    Y = np.fft.rfft(y, n_fft)
    r_full = np.fft.irfft(S * np.conj(S), n_fft)
    r = r_full[:filt_len].copy()
    r[0] += 1e-10 * (r[0] if r[0] > 0 else 1.0)  # regularize the Toeplitz solve
    c_full = np.fft.irfft(Y * np.conj(S), n_fft)
    c = c_full[:filt_len]

    h = scipy.linalg.solve_toeplitz(r, c)
    s_target = scipy.signal.fftconvolve(s, h)[:n]
    e = y - s_target
    num = float(np.sum(s_target**2))
    den = float(np.sum(e**2))
    if den <= 0:
        return np.inf
    return 10.0 * np.log10(num / max(den, 1e-30))


def bss_eval_sdr(reference: np.ndarray, estimate: np.ndarray, filt_len: int = 512) -> float:
    """BSS_EVAL SDR in dB for one reference/estimate pair."""
    return _projection_sdr(reference, estimate, filt_len)


def _si_snr_np(estimate: np.ndarray, target: np.ndarray, eps: float = 1e-16) -> float:
    n = min(len(estimate), len(target))
    e = estimate[:n] - np.mean(estimate[:n])
    t = target[:n] - np.mean(target[:n])
    proj = (np.dot(e, t) / (np.dot(t, t) + eps)) * t
    noise = e - proj
    return float(10.0 * np.log10(np.dot(proj, proj) / (np.dot(noise, noise) + eps) + eps))


def si_snr_improvement(
    estimate: np.ndarray, target: np.ndarray, mixture: np.ndarray
) -> float:
    """SI-SNRi = SI-SNR(est, target) − SI-SNR(mixture, target), in dB."""
    return _si_snr_np(estimate, target) - _si_snr_np(mixture, target)


def sdr_improvement(estimate: np.ndarray, target: np.ndarray, mixture: np.ndarray) -> float:
    """SDRi, matching the reference report's methodology (§2.4)."""
    return bss_eval_sdr(target, estimate) - bss_eval_sdr(target, mixture)
