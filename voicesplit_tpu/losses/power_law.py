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
    prediction = prediction + epsilon
    target = target + epsilon
    pred_c = jnp.power(prediction, power)
    tgt_c = jnp.power(target, power)
    spec_loss = jnp.mean(jnp.square(jnp.abs(tgt_c) - jnp.abs(pred_c)))
    complex_loss = jnp.mean(jnp.square(tgt_c - pred_c))
    return spec_loss + complex_loss * complex_loss_ratio
