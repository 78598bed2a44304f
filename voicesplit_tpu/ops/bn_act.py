"""Fused BatchNorm+activation with a hand-written two-pass backward.

Why this exists (measured, v5e, B=16, the 7-layer folded conv stack with
a dense cotangent — `scripts/ablate_conv.py`):

    raw folded convs            fwd+bwd  67.5 ms   (≈ MXU speed of light)
    + BatchNorm                        +32.6 ms
    + mish                             +22.8 ms
    production chain                   106.1 ms

The convs are at speed of light; ~60% overhead is the BN/mish
elementwise chains.  The *minimum* HBM traffic for their backward is two
fused passes over the [B, T, F, C] activation (a per-channel reduce pass
reading (dy, x), then a dx pass reading (dy, x) and writing dx) — but
JAX autodiff of the straight-line BN+mish code saves every transcendental
intermediate (tanh(softplus(z)), sigmoid(z), the normalized x̂ ...), each
a full 371 MB tensor written in forward and re-read in backward.
`jax.checkpoint` does NOT fix this (measured worse: 119.8/126.2 ms — it
re-runs the whole fwd including stats reduces).

This custom VJP saves ONLY the conv output ``x`` (which the next conv's
filter gradient keeps alive anyway) plus the [C] statistics, and
recomputes ``z`` and the activation derivative in the backward's two
fused elementwise stages — VPU transcendentals are free under the HBM
bandwidth bound.

Backward math (y = act(z), z = γ·x̂ + β, x̂ = (x−μ)·r, r = rsqrt(v+ε),
μ/v batch statistics of x over (B, T, F_real)):

    dz  = dy ⊙ act'(z)
    dβ  = Σ dz            dγ = Σ dz·x̂          (per channel, real positions)
    dx  = γ·r·(dz − mean(dz) − x̂·mean(dz·x̂))   (statistics-aware BN grad)

mish'(z) = t + z·(1−t²)·σ(z) with t = tanh(softplus(z)); relu'(z) = z>0.

Folded-layout notes (`ops/conv_fold.py`): the input arrives as
[B, T, Fb, FOLD*C] whose trailing pad column (odd F) may hold conv
garbage; the op zeroes it on read, excludes it from statistics via the
real element count, and emits a zero pad column in both y and dx.

The (new_mean, new_var) outputs exist only to update non-differentiated
running-statistics buffers; their incoming cotangents are ignored by the
backward (asserting that use — the trainer never differentiates through
the running stats).

Replaces the reference's `torch.nn.BatchNorm2d` + `Mish`
(`models/voicefilter/model.py:17-54`, `utils/generic_utils.py:376-399`)
semantics exactly; parity + grad tests in `tests/test_bn_act.py`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from voicesplit_tpu.ops.conv_fold import FOLD, zero_pad_column


def _act_and_deriv(z: jnp.ndarray, act: str, need_deriv: bool):
    if act == "mish":
        sp = jax.nn.softplus(z)
        t = jnp.tanh(sp)
        y = z * t
        if not need_deriv:
            return y, None
        d = t + z * (1.0 - t * t) * jax.nn.sigmoid(z)
        return y, d
    if act == "relu":
        y = jnp.maximum(z, 0.0)
        if not need_deriv:
            return y, None
        return y, (z > 0).astype(z.dtype)
    raise ValueError(f"unknown activation {act!r}")


# single source of truth for the folded pad-column invariant
_zero_pad_col = zero_pad_column


def _stats(xf: jnp.ndarray, num_freq: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 per-REAL-channel (C) mean/var over real positions.

    Assumes the pad column is already zero (true after `_zero_pad_col`),
    so plain sums over the folded view are exact with the real count.
    """
    B, T, Fb, C2 = xf.shape
    C = C2 // FOLD
    n = B * T * num_freq
    xs = xf.astype(jnp.float32)
    total = jnp.sum(xs, axis=(0, 1, 2)).reshape(FOLD, C).sum(axis=0)
    total_sq = jnp.sum(jnp.square(xs), axis=(0, 1, 2)).reshape(FOLD, C).sum(axis=0)
    mean = total / n
    var = jnp.maximum(total_sq / n - jnp.square(mean), 0.0)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def folded_bn_act_train(
    xf: jnp.ndarray,  # [B, T, Fb, FOLD*C] folded conv output (pad col may be garbage)
    scale: jnp.ndarray,  # [C] fp32
    bias: jnp.ndarray,  # [C] fp32
    num_freq: int,
    act: str,
    epsilon: float = 1e-5,
):
    """Training-mode fused BN(batch stats)+act in folded layout.

    Returns ``(y, mean, var)`` — y with a zero pad column; mean/var are
    the fp32 batch statistics for the caller's running-average update
    (that path must not be differentiated).
    """
    y, _, mean, var = _fwd_impl(xf, scale, bias, num_freq, act, epsilon)
    return y, mean, var


def _fwd_impl(xf, scale, bias, num_freq, act, epsilon):
    xf = _zero_pad_col(xf, num_freq)
    mean, var = _stats(xf, num_freq)
    r = jax.lax.rsqrt(var + epsilon)
    inv = (scale * r).astype(xf.dtype)
    shift = (bias - mean * scale * r).astype(xf.dtype)
    z = xf * jnp.tile(inv, FOLD) + jnp.tile(shift, FOLD)
    y, _ = _act_and_deriv(z, act, need_deriv=False)
    return _zero_pad_col(y, num_freq), r, mean, var


def _vjp_fwd(xf, scale, bias, num_freq, act, epsilon):
    y, r, mean, var = _fwd_impl(xf, scale, bias, num_freq, act, epsilon)
    return (y, mean, var), (xf, scale, bias, mean, r)


def _vjp_bwd(num_freq, act, epsilon, residuals, cts):
    dy, _dmean, _dvar = cts  # stats cotangents: running-buffer path only
    xf, scale, bias, mean, r = residuals
    B, T, Fb, C2 = xf.shape
    C = C2 // FOLD
    n = B * T * num_freq
    cd = xf.dtype

    # recompute the cheap forward pieces (VPU work, no extra HBM tensors)
    xf = _zero_pad_col(xf, num_freq)
    dy = _zero_pad_col(dy.astype(cd), num_freq)
    inv_f = jnp.tile((scale * r).astype(cd), FOLD)
    shift_f = jnp.tile((bias - mean * scale * r).astype(cd), FOLD)
    xhat_scale = jnp.tile(r.astype(cd), FOLD)
    xmean = jnp.tile(mean.astype(cd), FOLD)

    def recompute(xf):
        z = xf * inv_f + shift_f
        _, dact = _act_and_deriv(z, act, need_deriv=True)
        xhat = (xf - xmean) * xhat_scale
        return dact, xhat

    # ---- stage 1: one fused reduce pass over (dy, xf) ----
    dact, xhat = recompute(xf)
    dz = dy * dact
    s_dz = jnp.sum(dz.astype(jnp.float32), axis=(0, 1, 2))  # [2C]
    s_dzx = jnp.sum((dz * xhat).astype(jnp.float32), axis=(0, 1, 2))
    dbeta = s_dz.reshape(FOLD, C).sum(axis=0)
    dgamma = s_dzx.reshape(FOLD, C).sum(axis=0)

    # ---- stage 2: one fused dx pass over (dy, xf) ----
    mean_dz = jnp.tile((dbeta / n).astype(cd), FOLD)
    mean_dzx = jnp.tile((dgamma / n).astype(cd), FOLD)
    # recomputed again so XLA fuses both stages independently — saving
    # dz/xhat across the reduce would materialize two 371 MB tensors
    dact2, xhat2 = recompute(xf)
    dz2 = dy * dact2
    dxf = inv_f * (dz2 - mean_dz - xhat2 * mean_dzx)
    dxf = _zero_pad_col(dxf, num_freq)

    return dxf.astype(cd), dgamma.astype(jnp.float32), dbeta.astype(jnp.float32)


folded_bn_act_train.defvjp(_vjp_fwd, _vjp_bwd)


def folded_bn_act_eval(
    xf: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    num_freq: int,
    act: str,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Eval-mode BN(running stats)+act — a plain affine, XLA autodiff is
    already optimal here (no statistics gradient path)."""
    xf = _zero_pad_col(xf, num_freq)
    r = jax.lax.rsqrt(running_var + epsilon)
    inv = (scale * r).astype(xf.dtype)
    shift = (bias - running_mean * scale * r).astype(xf.dtype)
    z = xf * jnp.tile(inv, FOLD) + jnp.tile(shift, FOLD)
    y, _ = _act_and_deriv(z, act, need_deriv=False)
    return _zero_pad_col(y, num_freq)
