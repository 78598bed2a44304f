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

from functools import partial

import jax
import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# Batched on-device BSS_EVAL (jit + vmap).
#
# The reference computes SDR one item at a time on the host
# (`utils/generic_utils.py:509`, mir_eval on CPU) — the acknowledged hot
# spot of its eval/sweep path (SURVEY.md §3.3).  Here the identical
# projection runs as ONE compiled program over the whole eval batch:
# FFT auto/cross-correlations, the 512-tap Toeplitz normal equations
# solved by Cholesky with one iterative-refinement step (recovers the
# float64 answer to <0.01 dB in fp32 — `tests/test_eval.py`), and the
# masked projection/residual energy ratio.
# ---------------------------------------------------------------------------


def _sdr_single_jax(s, y, length, filt_len: int, n_fft: int):
    """SDR of one zero-padded pair; `length` is the valid-sample count.

    Mathematically identical to `_projection_sdr`: zero padding does not
    change linear correlations, and the energy sums are masked to
    [:length] exactly as the numpy path truncates to n.
    """
    n = s.shape[-1]
    # Degenerate-shape guard: a filter can't have more taps than samples
    # (the host path's Toeplitz system would be singular there too).
    filt_len = min(filt_len, n)
    idx = jnp.arange(n)
    mask = (idx < length).astype(jnp.float32)
    s = s * mask
    y = y * mask

    S = jnp.fft.rfft(s, n_fft)
    Y = jnp.fft.rfft(y, n_fft)
    r = jnp.fft.irfft(S * jnp.conj(S), n_fft)[:filt_len]
    c = jnp.fft.irfft(Y * jnp.conj(S), n_fft)[:filt_len]

    # Diagonal loading: the numpy path uses 1e-10 relative (float64);
    # fp32 Cholesky needs more (1e-6) to stay SPD on near-singular
    # speech autocorrelations.  Note the refinement step below converges
    # to the LOADED system's solution — it cancels fp32 solve error, not
    # the loading bias; that bias is what bounds agreement with the
    # float64 host path to ~0.01 dB (and caps resolvable SDR, see
    # `bss_eval_sdr_batch`).
    r0 = r[0]
    r = r.at[0].add(1e-6 * jnp.where(r0 > 0, r0, 1.0) + 1e-10)

    lag = jnp.abs(idx[:filt_len, None] - idx[None, :filt_len])
    T = r[lag]
    cho = jax.scipy.linalg.cho_factor(T)
    h = jax.scipy.linalg.cho_solve(cho, c)
    # one step of iterative refinement (fp32 residual re-solve); the
    # matvec must not be demoted to bf16 passes on TPU (dsp/stft.py:43)
    hi = jax.lax.Precision.HIGHEST
    h = h + jax.scipy.linalg.cho_solve(cho, c - jnp.dot(T, h, precision=hi))

    H = jnp.fft.rfft(h, n_fft)
    s_target = jnp.fft.irfft(S * H, n_fft)[:n] * mask
    e = y - s_target
    num = jnp.sum(s_target**2)
    den = jnp.sum(e**2)
    sdr = 10.0 * jnp.log10(jnp.maximum(num, 1e-30) / jnp.maximum(den, 1e-30))
    return jnp.where(den <= 0, jnp.inf, sdr)


@partial(jax.jit, static_argnames=("filt_len",))
def _sdr_batch_jax(reference, estimate, lengths, filt_len: int = 512):
    n = reference.shape[-1]
    n_fft = int(2 ** np.ceil(np.log2(n + filt_len)))
    fn = partial(_sdr_single_jax, filt_len=filt_len, n_fft=n_fft)
    return jax.vmap(fn)(
        reference.astype(jnp.float32), estimate.astype(jnp.float32), lengths
    )


@jax.jit
def _si_snri_batch_jax(estimate, target, mixture, lengths):
    idx = jnp.arange(target.shape[-1])

    def one(e, t, m, length):
        mask = (idx < length).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(mask), 1.0)

        hi = jax.lax.Precision.HIGHEST

        def si_snr(x, ref):
            x = (x - jnp.sum(x * mask) / cnt) * mask
            ref = (ref - jnp.sum(ref * mask) / cnt) * mask
            dot = lambda a, b: jnp.dot(a, b, precision=hi)  # noqa: E731
            proj = (dot(x, ref) / (dot(ref, ref) + 1e-16)) * ref
            noise = x - proj
            return 10.0 * jnp.log10(
                dot(proj, proj) / (dot(noise, noise) + 1e-16) + 1e-16
            )

        return si_snr(e, t) - si_snr(m, t)

    return jax.vmap(one)(
        estimate.astype(jnp.float32),
        target.astype(jnp.float32),
        mixture.astype(jnp.float32),
        lengths,
    )


@partial(jax.jit, static_argnames=("filt_len",))
def _sdr_and_si_snri_batch(est, target, mixture, lengths, filt_len: int = 512):
    """Fused device eval metrics on device-resident arrays.

    Pads/crops `est` to the target length (static shapes), then computes
    (sdr[B], si_snri[B]) in one program — `validate()` uses this so the
    estimated waveforms never cross the device→host boundary.
    """
    n = target.shape[-1]
    ne = est.shape[-1]
    if ne < n:
        est = jnp.pad(est, ((0, 0), (0, n - ne)))
    elif ne > n:
        est = est[:, :n]
    est = est.astype(jnp.float32)
    target = target.astype(jnp.float32)
    lengths = jnp.minimum(lengths.astype(jnp.int32), n)
    n_fft = int(2 ** np.ceil(np.log2(n + filt_len)))
    sdr = jax.vmap(partial(_sdr_single_jax, filt_len=filt_len, n_fft=n_fft))(
        target, est, lengths
    )
    snri = _si_snri_batch_jax(est, target, mixture, lengths)
    return sdr, snri


def bss_eval_sdr_batch(
    reference: np.ndarray,
    estimate: np.ndarray,
    lengths: np.ndarray,
    filt_len: int = 512,
) -> np.ndarray:
    """Batched on-device BSS_EVAL SDR.

    reference/estimate: [B, N] zero-padded waveforms; lengths: [B] valid
    sample counts.  Returns [B] SDRs in dB (float32; within 0.01 dB of
    the float64 host path on real speech in the <40 dB range results
    live in; the fp32 residual noise floor caps resolvable SDR ≈75 dB —
    `tests/test_eval.py`).
    """
    return np.asarray(
        _sdr_batch_jax(jnp.asarray(reference), jnp.asarray(estimate),
                       jnp.asarray(lengths, jnp.int32), filt_len=filt_len)
    )


def si_snr_improvement_batch(
    estimate: np.ndarray, target: np.ndarray, mixture: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Batched on-device SI-SNRi over zero-padded [B, N] waveforms."""
    return np.asarray(
        _si_snri_batch_jax(
            jnp.asarray(estimate), jnp.asarray(target), jnp.asarray(mixture),
            jnp.asarray(lengths, jnp.int32),
        )
    )
