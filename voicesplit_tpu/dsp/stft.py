"""STFT / iSTFT as MXU matmuls.

The reference computes STFTs three ways (librosa FFT in
`utils/audio_processor.py:511-514`, a conv1d-against-Fourier-basis torch
module in `utils/stft.py:46-69`, and `torchaudio.functional.istft` for the
differentiable training path, `utils/audio_processor.py:498-509`).  This
module provides ONE implementation of that math, designed for TPU:

- **Framing** uses a strided gather with static shapes.
- **DFT** is a single ``[B*T, n_fft] @ [n_fft, 2F]`` matmul against a
  windowed real/imag Fourier basis — large, batched, MXU-shaped, and
  indifferent to the awkward non-power-of-2 ``n_fft=1200``.
- **Inverse DFT** is the transposed-basis matmul with Hermitian-symmetry
  coefficient doubling.
- **Overlap-add** is expressed as a precomputed 0/1 *subframe scatter
  matrix* matmul (the gcd-subframe decomposition used by
  ``tf.signal.overlap_and_add``), so the whole iSTFT is matmuls — fully
  differentiable and fusable by XLA.
- The **window-sumsquare envelope** (reference `utils/generic_utils.py:
  597-638`) is precomputed in numpy (static shapes) and applied as an
  elementwise divide.

Conventions match librosa: ``center=True`` reflect-padding by
``n_fft // 2``, windows padded centered to ``n_fft``, iSTFT trims
``n_fft // 2`` from both ends.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voicesplit_tpu.dsp.windows import get_window, pad_center

_TINY = 1.1754944e-38  # smallest positive normal float32 (librosa util.tiny)

# DSP transforms must be numerically faithful to the reference FFTs: force
# full-fp32 MXU passes (default TPU matmul precision is bf16 and costs ~60 dB
# of reconstruction SNR here; the DSP matmuls are a tiny fraction of step
# FLOPs so HIGHEST is essentially free).
_PRECISION = jax.lax.Precision.HIGHEST


def _matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_PRECISION)


def num_frames(n_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames for a signal of `n_samples`."""
    if center:
        n_samples = n_samples + 2 * (n_fft // 2)
    return 1 + (n_samples - n_fft) // hop_length


# ---------------------------------------------------------------------------
# Precomputed constants (numpy, cached — shapes are static under jit)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def stft_basis(
    n_fft: int, win_length: int, window: str = "hann", periodic: bool | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed forward-DFT bases ``(cos_basis, sin_basis)``, each ``[n_fft, F]``.

    ``S[f] = sum_n w[n] x[n] e^{-2 pi i f n / n_fft}`` so
    ``Re S = frames @ cos_basis`` and ``Im S = frames @ sin_basis``.
    """
    F = n_fft // 2 + 1
    w = pad_center(get_window(window, win_length, periodic), n_fft)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(F, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    cos_b = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_b, sin_b


@lru_cache(maxsize=None)
def istft_basis(
    n_fft: int, win_length: int, window: str = "hann", periodic: bool | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed inverse-DFT bases ``(cos_inv, sin_inv)``, each ``[F, n_fft]``.

    ``frames = (Re S) @ cos_inv + (Im S) @ sin_inv`` reproduces
    ``w * irfft(S)``: one-sided Hermitian reconstruction with coefficient 2
    on interior bins, synthesis window folded in.
    """
    F = n_fft // 2 + 1
    w = pad_center(get_window(window, win_length, periodic), n_fft)
    f = np.arange(F, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    coef = np.full((F, 1), 2.0)
    coef[0, 0] = 1.0
    if n_fft % 2 == 0:
        coef[-1, 0] = 1.0
    cos_i = (coef * np.cos(ang) / n_fft * w[None, :]).astype(np.float32)
    sin_i = (-coef * np.sin(ang) / n_fft * w[None, :]).astype(np.float32)
    return cos_i, sin_i


# ---------------------------------------------------------------------------
# In-graph basis builders.
#
# The numpy bases above are exact but, closed over inside jit, they embed
# multi-MB constants in every compiled program — the tunneled dev
# platform's remote-compile rejects large HLO payloads (HTTP 413 on the
# Griffin-Lim program), and big payloads slow every compile.  These build
# the same bases from iota INSIDE the graph.  Accuracy: the DFT angle is
# reduced exactly first — (n·f) mod n_fft in int32 (max n_fft²/4 ≪ 2³¹) —
# so fp32 cos/sin see arguments in [0, 2π) and match the float64-computed
# numpy bases to ~1e-7 (without the reduction, fp32 cos at ~4e3 rad loses
# ~1e-4).  Golden librosa/torch parity tests pass unchanged.
# ---------------------------------------------------------------------------


def _stft_basis_ingraph(
    n_fft: int, win_length: int, window: str = "hann",
    periodic: bool | None = None, dtype=jnp.float32,
):
    F = n_fft // 2 + 1
    w = jnp.asarray(pad_center(get_window(window, win_length, periodic), n_fft), dtype)
    n = jnp.arange(n_fft, dtype=jnp.int32)[:, None]
    f = jnp.arange(F, dtype=jnp.int32)[None, :]
    ang = ((n * f) % n_fft).astype(dtype) * jnp.asarray(2.0 * np.pi / n_fft, dtype)
    cos_b = jnp.cos(ang) * w[:, None]
    sin_b = -jnp.sin(ang) * w[:, None]
    return cos_b, sin_b


def _istft_basis_ingraph(
    n_fft: int, win_length: int, window: str = "hann",
    periodic: bool | None = None, dtype=jnp.float32,
):
    F = n_fft // 2 + 1
    w = jnp.asarray(pad_center(get_window(window, win_length, periodic), n_fft), dtype)
    f = jnp.arange(F, dtype=jnp.int32)[:, None]
    n = jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    ang = ((f * n) % n_fft).astype(dtype) * jnp.asarray(2.0 * np.pi / n_fft, dtype)
    coef = jnp.full((F, 1), 2.0, dtype)
    coef = coef.at[0, 0].set(1.0)
    if n_fft % 2 == 0:
        coef = coef.at[-1, 0].set(1.0)
    scale = coef / jnp.asarray(n_fft, dtype)
    cos_i = scale * jnp.cos(ang) * w[None, :]
    sin_i = -scale * jnp.sin(ang) * w[None, :]
    return cos_i, sin_i


def _overlap_add_matrix_ingraph(
    n_frames: int, n_fft: int, hop_length: int, dtype=jnp.float32
):
    sub = math.gcd(n_fft, hop_length)
    fsub = n_fft // sub
    step = hop_length // sub
    out_sub = (n_frames - 1) * step + fsub
    rows = jnp.arange(out_sub, dtype=jnp.int32)[:, None]
    col = jnp.arange(n_frames * fsub, dtype=jnp.int32)[None, :]
    target = (col // fsub) * step + (col % fsub)
    return (rows == target).astype(dtype)


@lru_cache(maxsize=None)
def _overlap_add_matrix(n_frames: int, n_fft: int, hop_length: int) -> np.ndarray:
    """0/1 scatter matrix ``M [out_subframes, n_frames * frame_subframes]``.

    With ``sub = gcd(n_fft, hop)``, frame ``t``'s ``i``-th subframe lands at
    output subframe ``t * (hop // sub) + i``; overlap-add of frames becomes
    ``M @ subframes`` — a plain matmul the MXU eats.
    """
    sub = math.gcd(n_fft, hop_length)
    fsub = n_fft // sub  # subframes per frame
    step = hop_length // sub  # subframe stride between frames
    out_sub = (n_frames - 1) * step + fsub
    M = np.zeros((out_sub, n_frames * fsub), dtype=np.float32)
    for t in range(n_frames):
        for i in range(fsub):
            M[t * step + i, t * fsub + i] = 1.0
    return M


@lru_cache(maxsize=None)
def window_sumsquare(
    n_frames: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    periodic: bool | None = None,
) -> np.ndarray:
    """Overlap-added squared-window envelope, ``[(n_frames-1)*hop + n_fft]``.

    Same quantity as reference `utils/generic_utils.py:597-638`
    (``window_sumsquare``), used to undo the synthesis-window weighting in
    the iSTFT overlap-add.
    """
    w2 = pad_center(get_window(window, win_length, periodic), n_fft) ** 2
    n_out = (n_frames - 1) * hop_length + n_fft
    env = np.zeros(n_out, dtype=np.float64)
    for t in range(n_frames):
        env[t * hop_length : t * hop_length + n_fft] += w2
    return env.astype(np.float32)


# ---------------------------------------------------------------------------
# Jit-friendly ops
# ---------------------------------------------------------------------------


def frame_signal(
    y: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """Slice ``y [..., L]`` into overlapping frames ``[..., T, n_fft]``.

    `center=True` reflect-pads by ``n_fft // 2`` first (librosa convention).

    Framing uses the gcd-subframe decomposition: with
    ``sub = gcd(n_fft, hop)`` the signal reshapes into ``sub``-sample
    subframes and each frame is ``n_fft/sub`` strided slices — static
    `lax.slice` ops XLA fuses, instead of a gather (the fancy-index
    gather lowered to a real TPU gather and dominated STFT time).
    """
    if center:
        pad = n_fft // 2
        pad_cfg = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, pad_cfg, mode="reflect")
    L = y.shape[-1]
    T = 1 + (L - n_fft) // hop_length
    # hop-block decomposition: reshape into hop-sized blocks, then frame t
    # is blocks [t, t + n_fft//hop) plus a partial block — plain stride-1
    # slices + one concat, which XLA fuses (a fancy-index gather here
    # lowered to a real TPU gather and dominated STFT time).
    nfull = n_fft // hop_length
    rem = n_fft % hop_length
    need = T + nfull + (1 if rem else 0)
    pad_r = need * hop_length - L
    if pad_r > 0:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad_r)])
    blocks = y[..., : need * hop_length].reshape(*y.shape[:-1], need, hop_length)
    parts = [blocks[..., k : k + T, :] for k in range(nfull)]
    if rem:
        parts.append(blocks[..., nfull : nfull + T, :rem])
    return jnp.concatenate(parts, axis=-1)


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT of ``y [..., L]`` → ``(real, imag)``, each ``[..., T, F]``.

    Matches ``librosa.stft`` (transposed to time-major), which the reference
    calls at `utils/audio_processor.py:511-514`.

    Frames come from the hop-block decomposition in `frame_signal`
    (stride-1 slices, no gather); the DFT is one big basis matmul.
    """
    cos_b, sin_b = _stft_basis_ingraph(n_fft, win_length, window, dtype=dtype)
    frames = frame_signal(y, n_fft, hop_length, center).astype(dtype)
    real = _matmul(frames, cos_b)
    imag = _matmul(frames, sin_b)
    return real, imag


def stft_magphase(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(magnitude, phase)`` of the STFT, each ``[..., T, F]``."""
    real, imag = stft(y, n_fft, hop_length, win_length, window, center)
    mag = jnp.sqrt(real * real + imag * imag + 1e-30)
    phase = jnp.arctan2(imag, real)
    return mag, phase


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add ``[..., T, n_fft]`` → ``[..., (T-1)*hop + n_fft]`` as a matmul."""
    *lead, T, n_fft = frames.shape
    sub = math.gcd(n_fft, hop_length)
    M = _overlap_add_matrix_ingraph(T, n_fft, hop_length, frames.dtype)
    subframes = frames.reshape(*lead, T * (n_fft // sub), sub)
    out = jnp.einsum("st,...tk->...sk", M, subframes, precision=_PRECISION)
    return out.reshape(*lead, -1)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    periodic: bool | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of ``(real, imag) [..., T, F]`` → waveform ``[..., L]``.

    Weighted-overlap-add with window-sumsquare correction; with
    ``window='hann'`` matches ``librosa.istft`` (reference
    `utils/audio_processor.py:478-482`), with ``window='hamming',
    periodic=False`` matches the torchaudio training path (reference
    `utils/audio_processor.py:509`).  Fully differentiable.
    """
    T = real.shape[-2]
    cos_i, sin_i = _istft_basis_ingraph(
        n_fft, win_length, window, periodic, dtype=real.dtype
    )
    frames = _matmul(real, cos_i) + _matmul(imag, sin_i)
    y = overlap_add(frames, hop_length)
    env = window_sumsquare(T, n_fft, hop_length, win_length, window, periodic)
    env_safe = np.where(env > _TINY, env, 1.0)
    y = y / jnp.asarray(env_safe, y.dtype)
    if center:
        pad = n_fft // 2
        y = y[..., pad:-pad] if pad else y
    if length is not None:
        # librosa/torchaudio semantics: exactly `length` samples — pad
        # with zeros when the frame grid covers fewer (T frames span only
        # (T-1)*hop + n_fft samples, short of lengths not on the hop grid)
        if y.shape[-1] < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
        else:
            y = y[..., :length]
    return y


def istft_magphase(
    mag: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    periodic: bool | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """iSTFT from ``(magnitude, phase)`` — the mixed-phase inversion path."""
    return istft(
        mag * jnp.cos(phase),
        mag * jnp.sin(phase),
        n_fft,
        hop_length,
        win_length,
        window,
        center,
        periodic,
        length,
    )
