"""Spectrogram amplitude/dB (de)normalization and preemphasis.

Bit-for-bit semantics of the reference's voicefilter backend
(`utils/audio_processor.py:537-547`): ``amp_to_db`` floors at 1e-5,
``normalize`` maps ``[min_level_db, 0] dB`` to ``[0, 1]`` with clipping.
All functions are elementwise jnp — they fuse into the surrounding matmuls
under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    """20*log10(max(1e-5, x))  (reference `utils/audio_processor.py:537-538`)."""
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    """10^(x/20)  (reference `utils/audio_processor.py:540-541`)."""
    return jnp.power(10.0, x * 0.05)


def normalize_db(S: jnp.ndarray, min_level_db: float = -100.0) -> jnp.ndarray:
    """clip(S / -min_level_db, -1, 0) + 1  (reference `:543-544`)."""
    return jnp.clip(S / -min_level_db, -1.0, 0.0) + 1.0


def denormalize_db(S: jnp.ndarray, min_level_db: float = -100.0) -> jnp.ndarray:
    """(clip(S, 0, 1) - 1) * -min_level_db  (reference `:546-547`).

    Differentiable — this sits on the SI-SNR training path (reference
    `utils/audio_processor.py:502`).
    """
    return (jnp.clip(S, 0.0, 1.0) - 1.0) * -min_level_db


def preemphasis(y: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[n] - coef*y[n-1]  (FIR; reference `utils/audio_processor.py:191-194`)."""
    if coef == 0.0:
        return y
    y0 = y[..., :1]
    return jnp.concatenate([y0, y[..., 1:] - coef * y[..., :-1]], axis=-1)


def inv_preemphasis(y: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """Inverse (IIR) filter of `preemphasis` via an associative scan.

    x[n] = y[n] + coef*x[n-1]  ⇒  x[n] = sum_k coef^k y[n-k], computed with
    `jax.lax.associative_scan` over the affine maps (log-depth on TPU
    instead of a length-L sequential loop).
    """
    if coef == 0.0:
        return y

    def combine(a, b):
        # each element is (multiplier, addend) of x -> m*x + t, composed
        ma, ta = a
        mb, tb = b
        return ma * mb, tb + mb * ta

    m = jnp.full_like(y, coef)
    _, x = jax.lax.associative_scan(combine, (m, y), axis=-1)
    return x
