"""Parity of the fused Pallas conv chain (`ops/conv_fused.py`) against
the default folded path (conv2d_folded + BN+act), values AND gradients.

Runs in Pallas interpret mode on CPU (same approach as
tests/test_pallas_conv.py); the real-TPU numbers live in
docs/KERNELS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicesplit_tpu.ops.conv_fold import (
    FOLD,
    conv2d_folded,
    fold_input,
    folded_freq,
    zero_pad_column,
)
from voicesplit_tpu.ops.conv_fused import FrameGeom, make_chain

# small but non-trivial geometry: odd F (real pad column), dilations,
# a (7,1) layer, enough freq blocks for nf >= 2 tiles
B, T, F, C = 2, 19, 37, 64
SPECS = [((7, 1), 1), ((5, 5), 1), ((5, 5), 2)]
EPS = 1e-5


def _params(rng):
    ws = tuple(
        jnp.asarray(rng.standard_normal((kt, kf, C, C)).astype(np.float32)) * 0.08
        for (kt, kf), _ in SPECS
    )
    cbs = tuple(
        jnp.asarray(rng.standard_normal((C,)).astype(np.float32)) * 0.1
        for _ in SPECS
    )
    scales = tuple(
        jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)).astype(np.float32))
        for _ in SPECS[:-1]
    )
    biases = tuple(
        jnp.asarray(0.1 * rng.standard_normal((C,)).astype(np.float32))
        for _ in SPECS[:-1]
    )
    return ws, cbs, scales, biases


def _act(z, act):
    if act == "mish":
        return z * jnp.tanh(jax.nn.softplus(z))
    return jnp.maximum(z, 0.0)


def _reference_chain(y1, ws, cbs, scales, biases, act):
    """Default-path composition: conv2d_folded + batch stats + act."""
    n = B * T * F
    h = y1
    means, vars_ = [], []
    for idx, ((kt, kf), dt) in enumerate(SPECS):
        raw = conv2d_folded(h, ws[idx], cbs[idx], (dt, 1))
        raw = zero_pad_column(raw, F)
        xs = raw.astype(jnp.float32)
        mean2 = jnp.sum(xs, axis=(0, 1, 2)).reshape(FOLD, C).sum(0) / n
        var2 = (
            jnp.sum(jnp.square(xs), axis=(0, 1, 2)).reshape(FOLD, C).sum(0) / n
            - jnp.square(mean2)
        )
        means.append(mean2)
        vars_.append(var2)
        if idx + 1 == len(SPECS):
            return raw, means, vars_
        inv = scales[idx] * jax.lax.rsqrt(var2 + EPS)
        shift = biases[idx] - mean2 * inv
        z = raw * jnp.tile(inv, FOLD) + jnp.tile(shift, FOLD)
        h = zero_pad_column(_act(z, act), F)


@pytest.mark.parametrize("act", ["mish", "relu"])
def test_chain_forward_and_grads_match_reference(rng, act):
    ws, cbs, scales, biases = _params(rng)
    Fb = folded_freq(F)
    y1 = fold_input(
        jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))
    )
    # realistic cotangent: zero pad column (what bn_act's backward emits)
    R = zero_pad_column(
        fold_input(jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))),
        F,
    )

    chain = make_chain(SPECS, T, F, act, EPS)

    def loss_fused(y1, ws, cbs, scales, biases):
        raw, means, vars_ = chain(y1, ws, cbs, scales, biases)
        return jnp.sum(raw.astype(jnp.float32) * R), (means, vars_)

    def loss_ref(y1, ws, cbs, scales, biases):
        raw, means, vars_ = _reference_chain(y1, ws, cbs, scales, biases, act)
        return jnp.sum(raw.astype(jnp.float32) * R), (means, vars_)

    (vf, (mf, vvf)), gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        y1, ws, cbs, scales, biases
    )
    (vr, (mr, vvr)), gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        y1, ws, cbs, scales, biases
    )

    np.testing.assert_allclose(vf, vr, rtol=2e-4)
    for a, b in zip(mf, mr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    for a, b in zip(vvf, vvr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    names = ["d_y1", "d_W", "d_conv_bias", "d_scale", "d_bias"]
    for name, a, b in zip(names, gf, gr):
        fa = jax.tree.leaves(a)
        fb = jax.tree.leaves(b)
        for la, lb in zip(fa, fb):
            if name == "d_conv_bias":
                # internal layers: analytically zero through
                # batch-stat BN (mean subtraction cancels a constant
                # shift) — both paths return float summation noise, so
                # an absolute noise floor is the right comparison; the
                # LAST layer's bias grad is real (sum of the cotangent)
                np.testing.assert_allclose(
                    np.asarray(la, np.float32),
                    np.asarray(lb, np.float32),
                    rtol=5e-3,
                    atol=2e-3,
                    err_msg=name,
                )
                continue
            scale = max(1e-3, float(jnp.max(jnp.abs(lb))))
            np.testing.assert_allclose(
                np.asarray(la, np.float32),
                np.asarray(lb, np.float32),
                rtol=5e-3,
                atol=5e-4 * scale,
                err_msg=name,
            )


def test_chain_geometry():
    g = FrameGeom(301, 601, 128, 32)
    assert g.H == 304 + 64 and g.Wf % g.f_tile == 0 and g.nf >= 2
    assert g.Wf >= 8 + g.Fb + 1


def test_masknet_fused_chain_matches_default(rng, monkeypatch):
    """End-to-end MaskNet parity: fused Pallas chain vs default folded
    path — mask values, grads, and running-stat updates."""
    import voicesplit_tpu.ops.conv_fused as cf
    from voicesplit_tpu.models.masknet import MaskNet

    Tm, Fm = 11, 37
    model = MaskNet(
        num_freq=Fm, emb_dim=16, lstm_dim=24, fc1_dim=20, fc2_dim=Fm,
        conv_channels=64, conv_out_channels=8, activation="mish",
        compute_dtype=jnp.float32,
    )
    spec = jnp.asarray(rng.standard_normal((2, Tm, Fm)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), spec, emb, train=False)

    def run(spec, variables):
        return model.apply(
            spec_and_emb_args(variables), spec, emb, train=True,
            mutable=["batch_stats"],
        )

    def spec_and_emb_args(v):
        return v

    def loss(params, use_fused):
        monkeypatch.setattr(cf, "fused_chain_enabled", lambda: use_fused)
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        mask, updates = model.apply(
            v, spec, emb, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(mask * mask), (mask, updates)

    (l_def, (m_def, u_def)), g_def = jax.value_and_grad(
        loss, has_aux=True)(variables["params"], False)
    (l_fus, (m_fus, u_fus)), g_fus = jax.value_and_grad(
        loss, has_aux=True)(variables["params"], True)

    np.testing.assert_allclose(float(l_fus), float(l_def), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m_fus), np.asarray(m_def), atol=2e-5)
    # running stats updated identically for every conv block
    flat_d = jax.tree_util.tree_leaves_with_path(u_def["batch_stats"])
    flat_f = jax.tree_util.tree_leaves_with_path(u_fus["batch_stats"])
    assert len(flat_d) == len(flat_f) and len(flat_d) >= 16
    for (pd, ld), (pf, lf) in zip(flat_d, flat_f):
        assert pd == pf
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=2e-4, atol=2e-4,
            err_msg=str(pd),
        )
    # gradients match (skip conv biases: analytically-zero noise)
    for (pd, ld), (pf, lf) in zip(
        jax.tree_util.tree_leaves_with_path(g_def),
        jax.tree_util.tree_leaves_with_path(g_fus),
    ):
        assert pd == pf
        name = jax.tree_util.keystr(pd)
        if "Conv_0" in name and "bias" in name:
            continue
        scale = max(1e-4, float(np.max(np.abs(np.asarray(ld)))))
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=5e-3, atol=1e-3 * scale,
            err_msg=name,
        )
