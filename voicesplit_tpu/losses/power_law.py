"""Power-law compressed spectral loss.

Reference `utils/generic_utils.py:353-373` (`PowerLaw_Compressed_Loss`),
λ from arXiv:1811.07030: compress both spectrograms with ``|x|^0.3`` and
combine MSE of magnitudes with λ-weighted MSE of the (compressed) values.
"""

from __future__ import annotations

import jax.numpy as jnp


def power_law_compressed_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    power: float = 0.3,
    complex_loss_ratio: float = 0.113,
    epsilon: float = 1e-16,
) -> jnp.ndarray:
    """MSE(|t|^p, |p|^p) + λ·MSE(t^p, p^p) over spectrograms of any shape.

    ε is added before compression to keep the ``x^0.3`` gradient finite at
    zero (the reference's NaN guard, `utils/generic_utils.py:359-364`).
    """
    # signed power compression: sign(x)·|x|^p.  Identical to the
    # reference's x^p on its non-negative [0,1] voicefilter specs, and
    # finite (not NaN) on backends whose specs go negative (waveglow's
    # ln-compressed mels) — pow(neg, 0.3) is NaN in both torch and jax.
    def compress(x):
        return jnp.sign(x) * jnp.power(jnp.abs(x) + epsilon, power)

    pred_c = compress(prediction)
    tgt_c = compress(target)
    spec_loss = jnp.mean(jnp.square(jnp.abs(tgt_c) - jnp.abs(pred_c)))
    complex_loss = jnp.mean(jnp.square(tgt_c - pred_c))
    return spec_loss + complex_loss * complex_loss_ratio
