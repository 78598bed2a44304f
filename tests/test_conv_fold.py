"""Folded-frequency conv path (the TPU default, `ops/conv_fold.py`):
exact parity with XLA's unfolded conv and with `nn.BatchNorm`, plus
end-to-end MaskNet equivalence between the folded and XLA conv paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.ops.conv_fold import (
    FOLD,
    conv2d_folded,
    fold_input,
    fold_kernel,
    folded_batch_norm,
    unfold_output,
    zero_pad_column,
)

B, T = 2, 19


def _xla_conv(x, w, b, dilation):
    kt, kf = w.shape[0], w.shape[1]
    dt, df = dilation
    pad_t = (kt - 1) * dt // 2
    pad_f = (kf - 1) * df // 2
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad_t, pad_t), (pad_f, pad_f)),
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def test_fold_unfold_roundtrip(rng):
    for F in (601, 20, 7):
        x = jnp.asarray(rng.standard_normal((B, T, F, 4)), jnp.float32)
        xf = fold_input(x)
        assert xf.shape == (B, T, (F + 1) // 2, 8)
        np.testing.assert_array_equal(np.asarray(unfold_output(xf, F)), np.asarray(x))


def test_fold_kernel_shapes(rng):
    # (kf, expected folded block taps)
    for kf, kb in ((5, 3), (7, 5), (1, 1)):
        k = jnp.asarray(rng.standard_normal((3, kf, 4, 6)), jnp.float32)
        fk = fold_kernel(k)
        assert fk.shape == (3, kb, 8, 12)
        # every original weight appears exactly twice (once per parity)
        assert np.isclose(float(jnp.sum(fk)), 2 * float(jnp.sum(k)), rtol=1e-5)


@pytest.mark.parametrize(
    "kernel,dilation,cin,cout",
    [
        ((1, 7), (1, 1), 1, 16),  # reference cnn1
        ((7, 1), (1, 1), 16, 16),  # cnn2
        ((5, 5), (1, 1), 16, 16),  # cnn3
        ((5, 5), (2, 1), 16, 16),
        ((5, 5), (16, 1), 16, 16),  # cnn7
        ((1, 1), (1, 1), 16, 8),  # cnn8
    ],
)
@pytest.mark.parametrize("F", [601, 20])
def test_conv_parity(rng, kernel, dilation, cin, cout, F):
    x = jnp.asarray(rng.standard_normal((B, T, F, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((*kernel, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = _xla_conv(x, w, b, dilation)
    got = unfold_output(conv2d_folded(fold_input(x), w, b, dilation), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_conv_parity_grads(rng):
    F, cin, cout = 41, 8, 8
    x = jnp.asarray(rng.standard_normal((B, T, F, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.1, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, T, F, cout)), jnp.float32)

    def loss_ref(w, x):
        return jnp.sum(_xla_conv(x, w, b, (2, 1)) * cot)

    def loss_fold(w, x):
        return jnp.sum(unfold_output(conv2d_folded(fold_input(x), w, b, (2, 1)), F) * cot)

    gw_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(w, x)
    gw_f, gx_f = jax.grad(loss_fold, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=2e-4, rtol=1e-4)


def test_folded_batch_norm_matches_flax(rng):
    import flax.linen as nn

    F, C = 31, 6  # odd F exercises the pad column
    x = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((C,)) * 0.3 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    ra_mean = jnp.asarray(rng.standard_normal((C,)) * 0.2, jnp.float32)
    ra_var = jnp.asarray(rng.standard_normal((C,)) ** 2 + 0.5, jnp.float32)

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": {"mean": ra_mean, "var": ra_var},
    }
    ref, updates = bn.apply(variables, x, mutable=["batch_stats"])

    xf = fold_input(x)
    got_f, new_mean, new_var = folded_batch_norm(
        xf, F, scale, bias, ra_mean, ra_var, use_running_average=False)
    got = unfold_output(got_f, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_mean), np.asarray(updates["batch_stats"]["mean"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_var), np.asarray(updates["batch_stats"]["var"]), atol=1e-5)

    # eval mode
    bn_e = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    ref_e = bn_e.apply(variables, x)
    got_ef, _, _ = folded_batch_norm(
        xf, F, scale, bias, ra_mean, ra_var, use_running_average=True)
    np.testing.assert_allclose(
        np.asarray(unfold_output(got_ef, F)), np.asarray(ref_e), atol=1e-4, rtol=1e-4)


def test_zero_pad_column(rng):
    F, C = 7, 4
    x = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    xf = fold_input(x) + 1.0  # pollute the pad column
    xf = zero_pad_column(xf, F)
    unf = np.asarray(xf.reshape(B, T, 8, C))
    np.testing.assert_array_equal(unf[:, :, 7, :], 0.0)
    # real columns untouched
    np.testing.assert_allclose(unf[:, :, :7, :], np.asarray(x) + 1.0, atol=1e-6)


def _masknet_outputs(monkeypatch, folded: bool, train: bool):
    monkeypatch.setenv("VOICESPLIT_FOLDED_CONV", "1" if folded else "0")
    from voicesplit_tpu.config import Config
    from voicesplit_tpu.models.masknet import make_masknet

    c = Config()
    # fp32 keeps the comparison tight; in bf16 the two paths differ only
    # by rounding order (~2e-4 in BN running means at init scale)
    c.train_config.compute_dtype = "float32"
    model = make_masknet(c)
    rng = np.random.default_rng(7)
    spec = jnp.asarray(rng.random((2, 23, 601)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), spec, emb)
    if train:
        out, updates = model.apply(
            variables, spec, emb, train=True, mutable=["batch_stats"])
        return variables, out, updates["batch_stats"]
    return variables, model.apply(variables, spec, emb, train=False), None


def test_masknet_folded_matches_xla_path(monkeypatch):
    v_f, out_f, bs_f = _masknet_outputs(monkeypatch, folded=True, train=True)
    v_x, out_x, bs_x = _masknet_outputs(monkeypatch, folded=False, train=True)
    # identical param trees (same init RNG -> same values)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_f["params"], v_x["params"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4),
        bs_f, bs_x)

    _, eval_f, _ = _masknet_outputs(monkeypatch, folded=True, train=False)
    _, eval_x, _ = _masknet_outputs(monkeypatch, folded=False, train=False)
    np.testing.assert_allclose(np.asarray(eval_f), np.asarray(eval_x), atol=2e-4)


def test_folded_batch_norm_ignores_pad_garbage(rng):
    """folded_batch_norm must zero the pad column itself: garbage there
    (allowed in conv2d_folded output) must not skew the statistics."""
    from voicesplit_tpu.ops.conv_fold import FOLD

    B, T, F, C = 2, 6, 7, 4  # odd F -> one pad parity in the last block
    Fb = -(-((F + 1)) // FOLD)
    xf = jnp.asarray(rng.standard_normal((B, T, Fb, FOLD * C)).astype(np.float32))
    scale = jnp.ones((C,)); bias = jnp.zeros((C,))
    rm = jnp.zeros((C,)); rv = jnp.ones((C,))
    clean, m1, v1 = folded_batch_norm(
        zero_pad_column(xf, F), F, scale, bias, rm, rv, use_running_average=False
    )
    dirty, m2, v2 = folded_batch_norm(
        xf.at[:, :, -1, -C:].set(1e6), F, scale, bias, rm, rv, use_running_average=False
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clean), np.asarray(dirty), atol=1e-5)


def test_tapsum_rejects_even_kernels(rng):
    from voicesplit_tpu.ops.conv_tapsum import conv2d_tapsum

    x = jnp.asarray(rng.standard_normal((1, 8, 10, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="odd kernel"):
        conv2d_tapsum(x, w)
