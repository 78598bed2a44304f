"""Dilated 2-D convolution as shifted tap-sum matmuls.

The mask net's hot op is the 5×5 time-dilated conv stack over
``[B, T, F=601, C=64]`` activations (reference
`models/voicefilter/model.py:17-54`).  XLA lowers `conv_general_dilated`
with C_in=C_out=64 to conv emitters that (a) under-utilize the MXU
(64 < 128 lanes) and (b) have a slow filter-gradient path for dilated
kernels.

This module expresses the same convolution as plain matmuls:

- **freq im2col**: concatenate the ``kf`` frequency taps along channels
  → ``[B, T, F, kf*C]`` (kf=5 ⇒ K=320, much better MXU sublane
  occupancy than K=64);
- **time tap-sum**: for each of the ``kt`` time taps, a static shifted
  slice of that tensor matmuls ``[kf*C, C_out]`` and the taps sum.

Everything is static shapes + dense dots, so jax autodiff produces the
backward as the same structure: the *filter* gradient becomes
``x_tapsᵀ @ dy`` — one huge-K contraction per tap on the MXU — instead
of XLA's dilated-filter-grad convolution.

Numerics are identical to `flax.linen.Conv` with explicit "same" zero
padding (validated in tests/test_models.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def conv2d_tapsum(
    x: jnp.ndarray,  # [B, T, F, Cin]  (NHWC; time is H, freq is W)
    w: jnp.ndarray,  # [kt, kf, Cin, Cout]
    b: jnp.ndarray | None = None,  # [Cout]
    dilation: Tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """"Same"-padded dilated conv, identical to the reference's
    ZeroPad2d+Conv2d (`models/voicefilter/model.py:17-54`)."""
    kt, kf, Cin, Cout = w.shape
    if kt % 2 == 0 or kf % 2 == 0:
        # symmetric floor-divided SAME padding below is only correct for
        # odd kernels (all the model uses); even dims would silently
        # clip the last tap slice
        raise ValueError(f"conv2d_tapsum requires odd kernel dims, got {(kt, kf)}")
    dt, df = dilation
    pad_t = (kt - 1) * dt // 2
    pad_f = (kf - 1) * df // 2
    B, T, F, _ = x.shape
    x = jnp.pad(x, ((0, 0), (pad_t, pad_t), (pad_f, pad_f), (0, 0)))

    if kf > 1:
        # freq im2col: K grows kf-fold; j-major (j, cin) ordering matches
        # w.reshape(kt, kf*Cin, Cout)
        xf = jnp.concatenate(
            [x[:, :, j * df : j * df + F, :] for j in range(kf)], axis=-1
        )
    else:
        xf = x
    wk = w.reshape(kt, kf * Cin, Cout)

    dtype = x.dtype
    out = None
    for i in range(kt):
        xi = xf[:, i * dt : i * dt + T]
        term = jnp.matmul(xi, wk[i].astype(dtype))
        out = term if out is None else out + term
    if b is not None:
        out = out + b.astype(dtype)
    return out
