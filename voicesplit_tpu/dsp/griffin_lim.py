"""Griffin-Lim phase reconstruction as a `lax.fori_loop`.

Reference behavior: `utils/audio_processor.py:516-523` — random initial
phase, then `griffin_lim_iters` rounds of iSTFT → STFT → phase replace.
Here the whole iteration is one jit-compiled loop of basis matmuls; no
host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voicesplit_tpu.dsp.stft import istft, stft


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iters: int = 60,
    window: str = "hann",
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Reconstruct a waveform from a magnitude spectrogram ``[..., T, F]``.

    `key` seeds the random initial phase (the reference uses
    ``np.random.rand``); defaults to a fixed seed for determinism.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mag = jnp.abs(magnitude)
    ang0 = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, mag.dtype)
    y0 = istft(mag * jnp.cos(ang0), mag * jnp.sin(ang0), n_fft, hop_length, win_length, window)

    def body(_, y):
        re, im = stft(y, n_fft, hop_length, win_length, window)
        norm = jnp.sqrt(re * re + im * im + 1e-16)
        # replace magnitude, keep estimated phase
        return istft(mag * re / norm, mag * im / norm, n_fft, hop_length, win_length, window)

    return jax.lax.fori_loop(0, n_iters, body, y0)
