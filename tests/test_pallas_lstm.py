"""Fused Pallas LSTM vs the lax.scan reference (interpreter mode on CPU,
compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.models.lstm import lstm_scan
from voicesplit_tpu.ops.lstm_pallas import fused_lstm_scan

B, T, H, F = 4, 13, 8, 16


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32))
    whh = jnp.asarray((rng.standard_normal((H, 4 * H)) * 0.3).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    return xp, whh, h0, c0


def test_forward_matches_scan():
    xp, whh, h0, c0 = _inputs()
    out_ref, (hf_ref, cf_ref) = lstm_scan(xp, whh, h0, c0)
    out, (hf, cf) = fused_lstm_scan(xp, whh, h0, c0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref), atol=1e-5)


@pytest.mark.parametrize("use_final_state", [False, True])
def test_gradients_match_scan(use_final_state):
    xp, whh, h0, c0 = _inputs(1)

    def loss_ref(xp, whh, h0, c0):
        out, (hf, cf) = lstm_scan(xp, whh, h0, c0)
        l = jnp.sum(jnp.sin(out))
        if use_final_state:
            l = l + jnp.sum(hf * hf) + jnp.sum(jnp.cos(cf))
        return l

    def loss_fused(xp, whh, h0, c0):
        out, (hf, cf) = fused_lstm_scan(xp, whh, h0, c0)
        l = jnp.sum(jnp.sin(out))
        if use_final_state:
            l = l + jnp.sum(hf * hf) + jnp.sum(jnp.cos(cf))
        return l

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, whh, h0, c0)
    g = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xp, whh, h0, c0)
    for a, b, name in zip(g, g_ref, ["dxp", "dwhh", "dh0", "dc0"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_lstm_module_pallas_flag_matches():
    """BiLSTM with use_pallas on CPU falls back to scan — same numbers."""
    from voicesplit_tpu.models.lstm import BiLSTM

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 9, F)).astype(np.float32))
    m1 = BiLSTM(H, use_pallas=False)
    v = m1.init(jax.random.PRNGKey(0), x)
    out1 = m1.apply(v, x)
    m2 = BiLSTM(H, use_pallas=True)
    out2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_fused_bilstm_matches_two_scans():
    """Fused both-directions kernel (interpret mode) == two lax.scan passes."""
    from voicesplit_tpu.models.lstm import lstm_scan
    from voicesplit_tpu.ops.lstm_pallas import fused_bilstm_scan

    rng = np.random.default_rng(11)
    B, T, H = 8, 19, 16
    xp_f = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32))
    xp_b = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32))
    whf = jnp.asarray((0.3 * rng.standard_normal((H, 4 * H))).astype(np.float32))
    whb = jnp.asarray((0.3 * rng.standard_normal((H, 4 * H))).astype(np.float32))
    zeros = jnp.zeros((B, H), jnp.float32)

    ref_f, _ = lstm_scan(xp_f, whf, zeros, zeros, reverse=False)
    ref_b, _ = lstm_scan(xp_b, whb, zeros, zeros, reverse=True)
    out_f, out_b = fused_bilstm_scan(xp_f, xp_b, whf, whb)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b), atol=1e-5)

    def loss_ref(xf, xb, wf, wb):
        a, _ = lstm_scan(xf, wf, zeros, zeros, False)
        b, _ = lstm_scan(xb, wb, zeros, zeros, True)
        return jnp.sum(jnp.sin(a) * jnp.cos(b))

    def loss_fused(xf, xb, wf, wb):
        a, b = fused_bilstm_scan(xf, xb, wf, wb)
        return jnp.sum(jnp.sin(a) * jnp.cos(b))

    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(xp_f, xp_b, whf, whb)
    g_fus = jax.grad(loss_fused, (0, 1, 2, 3))(xp_f, xp_b, whf, whb)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
