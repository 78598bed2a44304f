"""Sequence-parallel long-form separation (`parallel/sequence.py`).

Load-bearing property: the time-sharded pass over an 8-device ``seq``
mesh produces EXACTLY the single-device full-sequence output — conv
halos cover the receptive field, the LSTM carry relay reconstructs the
true recurrence, and the shard-alignment padding never leaks into real
frames.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.parallel.sequence import (
    make_seq_mesh,
    make_sp_mask_fn,
    pad_frames,
    separate_long,
)

SR = 16000


@pytest.fixture(scope="module")
def small_setup():
    c = Config()
    c.model_name = "voicesplit"
    c.model.lstm_dim = 24
    c.model.fc1_dim = 32
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.compute_dtype = "float32"
    model = make_masknet(c)
    F = c.audio.active.num_freq
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, F)), jnp.zeros((1, 256))
    )
    return c, model, variables


def test_relay_scan_matches_full_scan():
    """The K-round carry relay must equal one unsharded scan."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from voicesplit_tpu.models.lstm import lstm_scan
    from voicesplit_tpu.parallel.sequence import _relay_scan

    K, B, Tc, H = 8, 2, 10, 16
    rng = np.random.default_rng(0)
    xp = rng.standard_normal((B, K * Tc, 4 * H)).astype(np.float32)
    w_hh = (0.3 * rng.standard_normal((H, 4 * H))).astype(np.float32)

    zeros = jnp.zeros((B, H), jnp.float32)
    for reverse in (False, True):
        ref, _ = lstm_scan(jnp.asarray(xp), jnp.asarray(w_hh), zeros, zeros, reverse)
        mesh = make_seq_mesh(K)
        fn = jax.shard_map(
            lambda x: _relay_scan(x, jnp.asarray(w_hh), K, "seq", reverse),
            mesh=mesh,
            in_specs=P(None, "seq", None),
            out_specs=P(None, "seq", None),
        )
        out = fn(jax.device_put(xp, NamedSharding(mesh, P(None, "seq", None))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_sp_mask_matches_full_pass(small_setup, causal):
    c, _, _ = small_setup
    c.model.causal = causal
    model = make_masknet(c)
    F = c.audio.active.num_freq
    K = 8
    Tc = model.conv_context_left + 3  # minimum legal shard + a bit
    T = K * Tc
    rng = np.random.default_rng(1)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 40, F)), jnp.zeros((1, 256))
    )
    spec = rng.uniform(0, 1, (2, T, F)).astype(np.float32)
    emb = rng.standard_normal((2, 256)).astype(np.float32)

    full = model.apply(variables, jnp.asarray(spec), jnp.asarray(emb))

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_seq_mesh(K)
    fn = make_sp_mask_fn(model, mesh)
    sp = fn(
        variables,
        jax.device_put(spec, NamedSharding(mesh, P(None, "seq", None))),
        jnp.asarray(emb),
        jnp.asarray(T, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-5)

    # alignment padding must not change real-frame output: re-run with
    # 16 padding frames per shard appended and t_valid still = T
    Tp = T + K * 16
    spec_p = np.zeros((2, Tp, F), np.float32)
    spec_p[:, :T] = spec
    fn_p = make_sp_mask_fn(model, mesh)
    sp_p = fn_p(
        variables,
        jax.device_put(spec_p, NamedSharding(mesh, P(None, "seq", None))),
        jnp.asarray(emb),
        jnp.asarray(T, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(sp_p)[:, :T], np.asarray(full), atol=2e-5)


def test_pad_frames():
    assert pad_frames(100, 8, 10) == 104
    assert pad_frames(100, 8, 70) == 560  # min_shard dominates
    assert pad_frames(560, 8, 70) == 560


def test_separate_long_end_to_end(small_setup):
    """Driver: long wav in → separated wav out, same length, matches the
    unsharded single-clip arrangement of the same model."""
    c, model, variables = small_setup
    c.model.causal = False
    rng = np.random.default_rng(3)
    wav = (0.1 * rng.standard_normal(SR * 4)).astype(np.float32)
    emb = rng.standard_normal(256).astype(np.float32)

    out = separate_long(c, variables, wav, emb, mesh=make_seq_mesh(8))
    assert out.shape == wav.shape
    assert np.isfinite(out).all()

    # unsharded arrangement for comparison
    from voicesplit_tpu.dsp.processor import AudioProcessor

    ap = AudioProcessor(c.audio)
    spec, phase = ap.wav2spec_batch(jnp.asarray(wav[None]))
    mask = model.apply(variables, spec, jnp.asarray(emb[None]))
    ref = np.asarray(
        ap.spec2wav_batch(mask * spec, phase, length=len(wav))
    )[0]
    np.testing.assert_allclose(out, ref, atol=1e-4)
