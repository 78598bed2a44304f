"""Loss-function tests against the published formulas (numpy references)."""

import numpy as np
import jax.numpy as jnp

from voicesplit_tpu.losses import (
    power_law_compressed_loss,
    sequence_mask,
    si_snr,
    si_snr_with_pit,
)


def test_power_law_numpy_reference():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (2, 30, 60)).astype(np.float32)
    tgt = rng.uniform(0, 1, (2, 30, 60)).astype(np.float32)
    p, lam, eps = 0.3, 0.113, 1e-16
    pc, tc = (pred + eps) ** p, (tgt + eps) ** p
    expected = np.mean((np.abs(tc) - np.abs(pc)) ** 2) + lam * np.mean((tc - pc) ** 2)
    got = float(power_law_compressed_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    assert np.isclose(got, expected, rtol=1e-5)


def test_power_law_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 10, 10)), jnp.float32)
    assert float(power_law_compressed_loss(x, x)) == 0.0


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.asarray([2, 4]), 5))
    assert m.shape == (2, 1, 5)
    np.testing.assert_array_equal(m[0, 0], [1, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[1, 0], [1, 1, 1, 1, 0])


def test_si_snr_perfect_reconstruction():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    vals = np.asarray(si_snr(jnp.asarray(x), jnp.asarray(x)))
    assert (vals > 100).all()  # ~eps-limited


def test_si_snr_scale_invariance():
    rng = np.random.default_rng(3)
    s = rng.standard_normal(1000).astype(np.float32)
    n = rng.standard_normal(1000).astype(np.float32)
    est = s + 0.1 * n
    a = float(si_snr(jnp.asarray(est), jnp.asarray(s)))
    b = float(si_snr(jnp.asarray(3.7 * est), jnp.asarray(s)))
    assert np.isclose(a, b, atol=1e-3)


def test_si_snr_known_value():
    """SI-SNR of s + alpha*orthogonal-noise is 10log10(||s||^2/alpha^2||n||^2)."""
    t = np.arange(8000) / 8000
    s = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    n = np.sin(2 * np.pi * 200 * t).astype(np.float32)  # orthogonal, zero-mean
    alpha = 0.1
    est = s + alpha * n
    expected = 10 * np.log10(np.sum(s**2) / np.sum((alpha * n) ** 2))
    got = float(si_snr(jnp.asarray(est), jnp.asarray(s)))
    assert np.isclose(got, expected, atol=0.05), (got, expected)


def test_pit_degenerates_to_si_snr_for_c1():
    rng = np.random.default_rng(4)
    s = rng.standard_normal((2, 1, 1000)).astype(np.float32)
    est = s + 0.2 * rng.standard_normal((2, 1, 1000)).astype(np.float32)
    loss = float(si_snr_with_pit(jnp.asarray(est), jnp.asarray(s)))
    plain = np.asarray(si_snr(jnp.asarray(est[:, 0]), jnp.asarray(s[:, 0])))
    assert np.isclose(loss, 20.0 - plain.mean(), atol=1e-3)


def test_pit_resolves_permutation():
    """Swapped channel order scores the same as aligned (PIT invariance)."""
    rng = np.random.default_rng(5)
    s = rng.standard_normal((2, 2, 500)).astype(np.float32)
    est = s + 0.1 * rng.standard_normal(s.shape).astype(np.float32)
    swapped = est[:, ::-1, :]
    a = float(si_snr_with_pit(jnp.asarray(est), jnp.asarray(s)))
    b = float(si_snr_with_pit(jnp.asarray(swapped.copy()), jnp.asarray(s)))
    assert np.isclose(a, b, atol=1e-4)


def test_pit_respects_lengths():
    rng = np.random.default_rng(6)
    s = rng.standard_normal((1, 1, 100)).astype(np.float32)
    est = s.copy()
    est[:, :, 50:] = 99.0  # garbage in the padded region
    s_pad = s.copy()
    s_pad[:, :, 50:] = 0.0
    loss = float(
        si_snr_with_pit(jnp.asarray(est), jnp.asarray(s_pad), jnp.asarray([50]))
    )
    assert loss < -40  # masked: effectively perfect reconstruction
