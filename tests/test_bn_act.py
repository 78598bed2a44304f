"""Parity + gradient tests for the fused BN+activation op (`ops/bn_act.py`).

Reference implementation: the separate `ops/conv_fold.py::folded_batch_norm`
followed by the activation (itself parity-tested against `nn.BatchNorm` /
torch Mish), differentiated by plain autodiff.  The fused op must match
values AND all gradients to float32 tolerance, including with an odd F
(garbage in the folded pad column) and for both activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicesplit_tpu.models.masknet import mish
from voicesplit_tpu.ops.bn_act import folded_bn_act_eval, folded_bn_act_train
from voicesplit_tpu.ops.conv_fold import (
    FOLD,
    fold_input,
    folded_batch_norm,
    zero_pad_column,
)

ACTS = {"mish": mish, "relu": jax.nn.relu}


def _reference(xf, scale, bias, num_freq, act):
    """Unfused: zero-pad → batch-stats BN → act → zero-pad.

    `folded_batch_norm` returns momentum-BLENDED running stats (the old
    module API); the fused op returns RAW batch stats (momentum applied
    by the module) — un-blend with the known zero/one init for parity.
    """
    xf = zero_pad_column(xf, num_freq)
    y, new_mean, new_var = folded_batch_norm(
        xf, num_freq, scale, bias,
        jnp.zeros_like(scale), jnp.ones_like(scale),
        use_running_average=False, momentum=0.9,
    )
    mean = new_mean / 0.1  # 0.9·0 + 0.1·mean
    var = (new_var - 0.9) / 0.1  # 0.9·1 + 0.1·var
    y = ACTS[act](y)
    return zero_pad_column(y, num_freq), mean, var


def _make(rng, B=2, T=7, F=11, C=8, garbage=True):
    x = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    xf = fold_input(x)
    if garbage and (F % FOLD):
        # simulate conv garbage in the pad column
        g = jnp.asarray(rng.standard_normal(xf.shape), jnp.float32) * 9.0
        mask = jnp.zeros(xf.shape, bool).at[:, :, -1, C:].set(F % FOLD == 1)
        xf = jnp.where(mask, g, xf)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    return xf, scale, bias


@pytest.mark.parametrize("act", ["mish", "relu"])
@pytest.mark.parametrize("F", [11, 12])
def test_train_forward_parity(rng, act, F):
    xf, scale, bias = _make(rng, F=F)
    y, mean, var = folded_bn_act_train(xf, scale, bias, F, act)
    y_ref, mean_ref, var_ref = _reference(xf, scale, bias, F, act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=1e-5)


@pytest.mark.parametrize("act", ["mish", "relu"])
@pytest.mark.parametrize("F", [11, 12])
def test_train_grads_match_autodiff(rng, act, F):
    xf, scale, bias = _make(rng, F=F)
    ct = jnp.asarray(rng.standard_normal(xf.shape), jnp.float32)

    def fused_loss(xf, scale, bias):
        y, _, _ = folded_bn_act_train(xf, scale, bias, F, act)
        return jnp.sum(y * ct)

    def ref_loss(xf, scale, bias):
        y, _, _ = _reference(xf, scale, bias, F, act)
        return jnp.sum(y * ct)

    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2))(xf, scale, bias)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(xf, scale, bias)
    for gf, gr, name in zip(g_fused, g_ref, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-4,
            err_msg=f"{name} mismatch ({act}, F={F})",
        )


@pytest.mark.parametrize("act", ["mish", "relu"])
def test_eval_matches_running_affine(rng, act):
    F = 11
    xf, scale, bias = _make(rng, F=F)
    rm = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    rv = jnp.asarray(rng.uniform(0.5, 2.0, (8,)), jnp.float32)
    y = folded_bn_act_eval(xf, scale, bias, rm, rv, F, act)
    xz = zero_pad_column(xf, F)
    y_ref, _, _ = folded_batch_norm(
        xz, F, scale, bias, rm, rv, use_running_average=True
    )
    y_ref = zero_pad_column(ACTS[act](y_ref), F)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_pad_column_zero_in_outputs_and_grads(rng):
    F = 11  # odd → one pad parity
    xf, scale, bias = _make(rng, F=F)
    C = 8
    y, _, _ = folded_bn_act_train(xf, scale, bias, F, "mish")
    assert np.all(np.asarray(y[:, :, -1, C:]) == 0)

    def loss(xf):
        y, _, _ = folded_bn_act_train(xf, scale, bias, F, "mish")
        return jnp.sum(y**2)

    dx = jax.grad(loss)(xf)
    assert np.all(np.asarray(dx[:, :, -1, C:]) == 0)


def test_bf16_path_runs_and_is_close(rng):
    F, C = 12, 8
    xf, scale, bias = _make(rng, F=F)
    y32, _, _ = folded_bn_act_train(xf, scale, bias, F, "mish")
    y16, _, _ = folded_bn_act_train(xf.astype(jnp.bfloat16), scale, bias, F, "mish")
    np.testing.assert_allclose(
        np.asarray(y16.astype(jnp.float32)), np.asarray(y32), atol=0.05
    )
