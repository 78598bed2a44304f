"""Mask-network and LSTM tests: shapes, parameter budget, gradients,
streaming-carry consistency, torch-LSTM numerical parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.models import BiLSTM, MaskNet, SpeakerEncoder, UniLSTM, make_masknet
from voicesplit_tpu.models.lstm import lstm_scan
from voicesplit_tpu.models.masknet import mish

B, T, F, EMB = 2, 31, 601, 256


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def model_and_vars():
    model = MaskNet(activation="relu")
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, T, F)),
        jnp.zeros((B, EMB)),
    )
    return model, variables


def test_mask_shape_and_range(model_and_vars):
    model, variables = model_and_vars
    spec = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, F)), jnp.float32)
    emb = jnp.asarray(np.random.default_rng(1).standard_normal((B, EMB)), jnp.float32)
    mask = model.apply(variables, spec, emb)
    assert mask.shape == (B, T, F)
    m = np.asarray(mask)
    assert (m > 0).all() and (m < 1).all()


def test_param_count_matches_reference(model_and_vars):
    """Reference model is ≈19 M params (SURVEY.md §6): conv ≈0.6 M,
    BiLSTM 2·4·(5064+400+1)·400 ≈ 17.5 M, FCs ≈0.84 M."""
    _, variables = model_and_vars
    n = _param_count(variables["params"])
    lstm_expected = 2 * (5064 * 1600 + 400 * 1600 + 1600)
    assert abs(n - 19.0e6) / 19.0e6 < 0.03, n
    lstm_n = _param_count(variables["params"]["lstm"])
    assert lstm_n == lstm_expected


def test_mish():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    expected = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(mish(jnp.asarray(x))), expected, atol=1e-5)


def test_voicesplit_variant_runs():
    model = MaskNet(activation="mish")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F)), jnp.zeros((1, EMB)))
    mask = model.apply(variables, jnp.ones((1, T, F)) * 0.5, jnp.ones((1, EMB)))
    assert np.isfinite(np.asarray(mask)).all()


def test_batchnorm_train_mode_updates_stats(model_and_vars):
    model, variables = model_and_vars
    spec = jnp.ones((B, T, F)) * 0.5
    emb = jnp.zeros((B, EMB))
    _, updates = model.apply(
        variables, spec, emb, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gradients_finite(model_and_vars):
    model, variables = model_and_vars
    spec = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (B, T, F)), jnp.float32)
    emb = jnp.asarray(np.random.default_rng(3).standard_normal((B, EMB)), jnp.float32)

    def loss_fn(params):
        mask = model.apply({**variables, "params": params}, spec, emb)
        return jnp.mean((mask * spec - spec * 0.5) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


# ---------------------------------------------------------------------------
# LSTM parity vs torch
# ---------------------------------------------------------------------------


def test_lstm_scan_matches_torch():
    rng = np.random.default_rng(0)
    Bt, Tt, Fin, H = 3, 11, 16, 8
    x = rng.standard_normal((Bt, Tt, Fin)).astype(np.float32)

    tl = torch.nn.LSTM(Fin, H, batch_first=True)
    with torch.no_grad():
        out_t, _ = tl(torch.from_numpy(x))
    out_t = out_t.numpy()

    # torch gate order: [i, f, g, o] — same as ours
    w_ih = tl.weight_ih_l0.detach().numpy().T  # [Fin, 4H]
    w_hh = tl.weight_hh_l0.detach().numpy().T  # [H, 4H]
    b = (tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy()

    x_proj = jnp.asarray(x) @ jnp.asarray(w_ih) + jnp.asarray(b)
    out, _ = lstm_scan(
        x_proj, jnp.asarray(w_hh), jnp.zeros((Bt, H)), jnp.zeros((Bt, H))
    )
    np.testing.assert_allclose(np.asarray(out), out_t, atol=2e-5)


def test_bilstm_matches_torch():
    rng = np.random.default_rng(1)
    Bt, Tt, Fin, H = 2, 9, 12, 6
    x = rng.standard_normal((Bt, Tt, Fin)).astype(np.float32)

    tl = torch.nn.LSTM(Fin, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        out_t, _ = tl(torch.from_numpy(x))
    out_t = out_t.numpy()

    model = BiLSTM(H)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "fwd_w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
        "fwd_w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
        "fwd_b": jnp.asarray((tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy()),
        "bwd_w_ih": jnp.asarray(tl.weight_ih_l0_reverse.detach().numpy().T),
        "bwd_w_hh": jnp.asarray(tl.weight_hh_l0_reverse.detach().numpy().T),
        "bwd_b": jnp.asarray(
            (tl.bias_ih_l0_reverse + tl.bias_hh_l0_reverse).detach().numpy()
        ),
    }
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_t, atol=2e-5)


def test_unilstm_carry_streaming_equivalence():
    """Running [0:T] in one shot == running [0:k] then [k:T] with carry."""
    rng = np.random.default_rng(2)
    Bt, Tt, Fin, H = 2, 20, 10, 8
    x = jnp.asarray(rng.standard_normal((Bt, Tt, Fin)).astype(np.float32))
    model = UniLSTM(H)
    variables = model.init(jax.random.PRNGKey(0), x)
    full, _ = model.apply(variables, x)
    a, carry = model.apply(variables, x[:, :12])
    b, _ = model.apply(variables, x[:, 12:], carry)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([a, b], axis=1)), np.asarray(full), atol=1e-5
    )


def test_masknet_streaming_mode():
    model = MaskNet(activation="relu", streaming=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F)), jnp.zeros((1, EMB)))
    spec = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, T, F)), jnp.float32)
    emb = jnp.zeros((1, EMB))
    mask, carry = model.apply(variables, spec, emb)
    assert mask.shape == (1, T, F)
    h, c = carry
    assert h.shape == (1, 400) and c.shape == (1, 400)
    mask2, _ = model.apply(variables, spec, emb, lstm_carry=carry)
    assert mask2.shape == (1, T, F)


def test_make_masknet_from_config():
    c = Config()
    assert make_masknet(c).activation == "mish"  # model_name=voicesplit
    assert make_masknet(c.replace(model_name="voicefilter")).activation == "relu"


def test_speaker_encoder_shapes():
    model = SpeakerEncoder()
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 40, 301)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), mel)
    emb = model.apply(variables, mel)
    assert emb.shape == (2, 256)
    # mean of per-window unit vectors has norm <= 1
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    assert (norms <= 1.0 + 1e-5).all() and (norms > 0.1).all()


def test_tapsum_conv_matches_nn_conv(model_and_vars, monkeypatch):
    """The TPU tap-sum conv path (ops/conv_tapsum.py) is numerically
    interchangeable with the flax/XLA conv path — same param tree, same
    mask output."""
    from voicesplit_tpu.models.masknet import tapsum_conv_enabled

    model, variables = model_and_vars
    rng = np.random.default_rng(7)
    spec = jnp.asarray(rng.uniform(0, 1, (B, T, F)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, EMB)).astype(np.float32))

    monkeypatch.setenv("VOICESPLIT_TAPSUM_CONV", "0")
    assert not tapsum_conv_enabled()
    mask_conv = model.apply(variables, spec, emb, train=False)

    monkeypatch.setenv("VOICESPLIT_TAPSUM_CONV", "1")
    assert tapsum_conv_enabled()
    # same variables load unchanged (identical param tree)
    mask_tap = model.apply(variables, spec, emb, train=False)

    np.testing.assert_allclose(
        np.asarray(mask_conv), np.asarray(mask_tap), atol=2e-5
    )


def test_tapsum_conv_grad_matches(model_and_vars, monkeypatch):
    model, variables = model_and_vars
    rng = np.random.default_rng(8)
    spec = jnp.asarray(rng.uniform(0, 1, (B, T, F)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, EMB)).astype(np.float32))

    def loss(params):
        m = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            spec, emb, train=False,
        )
        return jnp.mean((m - 0.5) ** 2)

    monkeypatch.setenv("VOICESPLIT_TAPSUM_CONV", "0")
    g0 = jax.grad(loss)(variables["params"])
    monkeypatch.setenv("VOICESPLIT_TAPSUM_CONV", "1")
    g1 = jax.grad(loss)(variables["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
