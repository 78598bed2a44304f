"""Pallas dilated-conv kernel parity (interpret mode on CPU) against
XLA's conv_general_dilated: forward, data grad, filter grad, and the
masknet-level dispatch path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.ops.conv_pallas import (
    conv2d_pallas,
    conv_dispatch,
    pallas_conv_available,
)

B, T, F, C = 2, 45, 140, 64


def _xla_conv(x, w, dilation):
    kt, kf = w.shape[0], w.shape[1]
    dt, df = dilation
    pad_t = (kt - 1) * dt // 2
    pad_f = (kf - 1) * df // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad_t, pad_t), (pad_f, pad_f)),
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "kernel,dilation",
    [((5, 5), (1, 1)), ((5, 5), (4, 1)), ((5, 5), (16, 1)), ((7, 1), (1, 1))],
)
def test_forward_matches_xla(kernel, dilation, rng):
    kt, kf = kernel
    x = jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))
    w = jnp.asarray((0.1 * rng.standard_normal((kt, kf, C, C))).astype(np.float32))
    ref = _xla_conv(x, w, dilation)
    got = conv2d_pallas(x, w, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_grads_match_xla(rng):
    dilation = (4, 1)
    x = jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))
    w = jnp.asarray((0.1 * rng.standard_normal((5, 5, C, C))).astype(np.float32))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(_xla_conv(x, w, dilation)))

    def f_got(x, w):
        return jnp.sum(jnp.sin(conv2d_pallas(x, w, dilation)))

    gx_ref, gw_ref = jax.grad(f_ref, (0, 1))(x, w)
    gx, gw = jax.grad(f_got, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=5e-3)


def test_dispatch_fallbacks(rng):
    """Small-channel / 1x1 layers route to XLA; identical results."""
    assert not pallas_conv_available()  # CPU test env
    x = jnp.asarray(rng.standard_normal((B, T, 31, 1)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 7, 1, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    ref = _xla_conv(x, w, (1, 1)) + b
    got = conv_dispatch(x, w, b, (1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
