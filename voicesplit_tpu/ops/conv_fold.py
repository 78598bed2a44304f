"""Frequency fold-by-2 convolution — the default conv path on TPU.

The mask net's conv stack (reference `models/voicefilter/model.py:17-54`)
runs 64-channel 5x5 convs over a [B, T=301, F=601, C=64] activation.  On
TPU, XLA's conv emitters pad both channel dims 64 -> 128 to fill the
128x128 MXU, so every layer executes 4x its real FLOPs.

This module reformulates each conv *exactly* by folding pairs of
adjacent frequency columns into the channel dimension:

    [B, T, F, C]  --pad F to even, bitcast-reshape-->  [B, T, F/2, 2C]

With C=64 the folded activation has 128 channels — a native MXU tile.
A freq-kernel-5 conv becomes a freq-kernel-3 conv over blocks whose
folded weights [kt, 3, 2C, 2C] hold each original tap at the (parity_in,
parity_out) offsets that realize it (10 of 12 parity slots are nonzero),
so the folded conv runs at ~1.2x the real FLOPs instead of XLA's 4x.

Measured on v5e-1 at flagship shape (B=16, six heavy layers in one jit,
fetch-synced): forward 44 -> 22.3 ms, forward+backward 143 -> 63 ms
(2.3x).  The fold itself is one pad + a free bitcast reshape, done ONCE
for the whole stack (`fold_input` / `unfold_output`); per-layer cost is
only the pad-column re-zeroing, which XLA fuses into the BatchNorm /
activation elementwise chain.

Derivation of the folded kernel: an output at frequency f = 2j + p_out
reads input f + o (o = tap offset, |o| <= kf//2) which lives in block
j + br at parity p_in where  2*br = o - p_in + p_out.  Enumerating all
(tap, p_in, p_out) with integral br fills the folded weight; slots whose
tap falls outside the original kernel stay zero.

Exactness: bit-identical contractions to the unfolded conv (same
summands, reassociated only across the zero-padded parity slots), so
parity with `nn.Conv` holds to float tolerance; `tests/test_conv_fold.py`
checks fwd and grads for every kernel shape / dilation the model uses.

BatchNorm stays exact in folded layout: `folded_batch_norm` views the
folded tensor as [B, T, F_padded, C] (a free reshape), zeroes the pad
column, and divides by the REAL element count B*T*F, reproducing
`nn.BatchNorm`'s per-channel statistics over the unpadded spectrogram.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FOLD = 2


def folded_conv_enabled() -> bool:
    """Default ON (all backends — it is plain XLA). VOICESPLIT_FOLDED_CONV=0 disables."""
    return os.environ.get("VOICESPLIT_FOLDED_CONV", "1") == "1"


def folded_freq(num_freq: int) -> int:
    """Number of frequency blocks after folding (ceil(F / 2))."""
    return (num_freq + FOLD - 1) // FOLD


def fold_input(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, F, C] -> [B, T, ceil(F/2), 2C]; pads F to even with a zero column.

    The reshape is a bitcast (no data movement): the natural
    [F_p, C] -> [F_p/2, 2, C] -> [F_p/2, 2C] flattening is parity-major,
    i.e. folded channel index = parity * C + c with parity = position
    inside the 2-wide frequency block.
    """
    B, T, F, C = x.shape
    n_pad = (-F) % FOLD
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    return x.reshape(B, T, (F + n_pad) // FOLD, FOLD * C)


def unfold_output(xf: jnp.ndarray, num_freq: int) -> jnp.ndarray:
    """[B, T, Fb, 2C] -> [B, T, F, C] (free reshape + pad-column slice)."""
    B, T, Fb, C2 = xf.shape
    x = xf.reshape(B, T, Fb * FOLD, C2 // FOLD)
    return x[:, :, :num_freq, :]


def fold_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[kt, kf, Cin, Cout] -> [kt, kb, 2*Cin, 2*Cout] folded weights."""
    kt, kf, cin, cout = kernel.shape
    half = kf // 2
    # valid block offsets br = (o - p_in + p_out) / 2
    brs = set()
    for tau in range(kf):
        o = tau - half
        for p_in in range(FOLD):
            for p_out in range(FOLD):
                if (o - p_in + p_out) % FOLD == 0:
                    brs.add((o - p_in + p_out) // FOLD)
    br_lo, br_hi = min(brs), max(brs)
    kb = br_hi - br_lo + 1
    out = jnp.zeros((kt, kb, FOLD * cin, FOLD * cout), kernel.dtype)
    for b in range(kb):
        br = b + br_lo
        for p_in in range(FOLD):
            for p_out in range(FOLD):
                tau = FOLD * br + p_in - p_out + half
                if 0 <= tau < kf:
                    out = out.at[
                        :, b,
                        p_in * cin:(p_in + 1) * cin,
                        p_out * cout:(p_out + 1) * cout,
                    ].set(kernel[:, tau])
    return out


def conv2d_folded(
    xf: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    dilation: Tuple[int, int],
    precision=None,
    time_padding: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Folded-layout "same" conv.

    ``xf``: [B, T, Fb, FOLD*Cin] folded activation whose pad column (if
    F is odd) is ZERO — callers must re-zero it after any op that could
    write garbage there (see `pad_column_mask`).
    ``kernel``: canonical [kt, kf, Cin, Cout] weights (freq dilation must
    be 1, as in every reference layer).  Returns folded [B, T, Fb,
    FOLD*Cout].  ``time_padding`` overrides the symmetric same-padding
    on the time axis (the causal stack uses ``(2e, 0)``).
    """
    dt, df = dilation
    if df != 1:
        raise ValueError("folded conv requires freq dilation 1 (reference uses 1)")
    kt = kernel.shape[0]
    kf_folded = fold_kernel(kernel)
    kb = kf_folded.shape[1]
    pad_t = (kt - 1) * dt // 2
    pad_b = (kb - 1) // 2
    out = jax.lax.conv_general_dilated(
        xf,
        kf_folded,
        window_strides=(1, 1),
        padding=(time_padding or (pad_t, pad_t), (pad_b, kb - 1 - pad_b)),
        rhs_dilation=(dt, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if bias is not None:
        out = out + jnp.tile(bias, FOLD).astype(out.dtype)
    return out


def zero_pad_column(xf: jnp.ndarray, num_freq: int) -> jnp.ndarray:
    """Re-zero the folded pad column (no-op when F is even)."""
    B, T, Fb, C2 = xf.shape
    n_pad = Fb * FOLD - num_freq
    if n_pad == 0:
        return xf
    C = C2 // FOLD
    # pad occupies the last n_pad parities of the last block
    return xf.at[:, :, -1, (FOLD - n_pad) * C:].set(0)


def folded_batch_norm(
    xf: jnp.ndarray,
    num_freq: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    use_running_average: bool,
    momentum: float = 0.9,
    epsilon: float = 1e-5,
):
    """Per-(real)-channel batch norm computed in folded layout.

    Exactly reproduces `nn.BatchNorm(momentum, epsilon)` over the
    unfolded [B, T, F, C] view: statistics are fp32 sums over the free
    [B, T, Fb*FOLD, C] reshape with the zero pad column excluded by
    using the real element count.  Returns (normalized folded tensor,
    new_running_mean, new_running_var); the running stats are unchanged
    when ``use_running_average``.
    """
    B, T, Fb, C2 = xf.shape
    C = C2 // FOLD
    # conv2d_folded's output pad column may hold conv garbage (its
    # documented contract); zero it here so the statistics below are
    # correct without every caller remembering to do it first.
    xf = zero_pad_column(xf, num_freq)
    x_view = xf.reshape(B, T, Fb * FOLD, C)
    if use_running_average:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    else:
        n_real = B * T * num_freq
        xs = x_view.astype(jnp.float32)
        total = jnp.sum(xs, axis=(0, 1, 2))
        total_sq = jnp.sum(jnp.square(xs), axis=(0, 1, 2))
        mean = total / n_real
        var = jnp.maximum(total_sq / n_real - jnp.square(mean), 0.0)
        new_mean = momentum * running_mean + (1.0 - momentum) * mean
        new_var = momentum * running_var + (1.0 - momentum) * var
    inv = jax.lax.rsqrt(var + epsilon) * scale
    shift = bias - mean * inv
    y = x_view * inv.astype(xf.dtype) + shift.astype(xf.dtype)
    return y.reshape(B, T, Fb, C2), new_mean, new_var
