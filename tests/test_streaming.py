"""Streaming-engine tests.

The load-bearing property: the chunked pipeline is *chunk-size
invariant* — any chunking produces the same output samples, proving the
STFT tail, conv context window, LSTM carry, and OLA carry are all
threaded correctly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.streaming import StreamingSeparator

SR = 16000


@pytest.fixture(scope="module")
def small_streaming_setup():
    c = Config()
    c.model_name = "voicesplit"
    c.model.lstm_dim = 24
    c.model.fc1_dim = 32
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.compute_dtype = "float32"
    model = make_masknet(c, streaming=True)
    T, F = 80, c.audio.active.num_freq
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, T, F)), jnp.zeros((1, 256))
    )
    return c, variables


def _wav(n=SR * 2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (
        0.05 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(n)
    ).astype(np.float32)


def test_chunk_size_invariance(small_streaming_setup):
    c, variables = small_streaming_setup
    emb = np.random.default_rng(1).standard_normal((1, 256)).astype(np.float32)
    wav = _wav()[None]
    out_small = StreamingSeparator(c, variables, chunk_frames=20).separate(wav, emb)
    out_large = StreamingSeparator(c, variables, chunk_frames=60).separate(wav, emb)
    assert out_small.shape == out_large.shape == wav.shape
    np.testing.assert_allclose(out_small, out_large, atol=2e-4)


def test_stream_state_shapes(small_streaming_setup):
    c, variables = small_streaming_setup
    sep = StreamingSeparator(c, variables, chunk_frames=30)
    st = sep.init_state(2)
    assert st.sample_tail.shape == (2, sep.n_fft - sep.hop)
    assert st.spec_hist.shape == (2, 2 * sep.ctx, 601)
    assert st.lstm_h.shape == (2, 24)
    emb = np.zeros((2, 256), np.float32)
    chunk = np.zeros((2, sep.chunk_samples), np.float32)
    st2, out = sep.process_chunk(st, chunk, emb)
    assert out.shape == (2, sep.chunk_samples)
    assert np.isfinite(np.asarray(out)).all()


def test_chunk_shape_validated(small_streaming_setup):
    c, variables = small_streaming_setup
    sep = StreamingSeparator(c, variables, chunk_frames=30)
    st = sep.init_state(1)
    with pytest.raises(ValueError, match="chunk must be"):
        sep.process_chunk(st, np.zeros((1, 100), np.float32), np.zeros((1, 256), np.float32))


def test_latency_constant(small_streaming_setup):
    c, variables = small_streaming_setup
    sep = StreamingSeparator(c, variables, chunk_frames=40)
    # ctx*hop + (n_fft - hop); ctx = one-sided conv receptive field = 65
    assert sep.latency_samples == 65 * 160 + (1200 - 160)


def test_threaded_state_keeps_one_compile(small_streaming_setup):
    """The output StreamState must have the exact dtype signature of
    init_state: a dtype flip (e.g. bf16 LSTM carry) silently recompiles
    the chunk step on the SECOND chunk and every stream thereafter runs
    against a churned cache (measured 32 s + ~300x slowdown on TPU)."""
    c, variables = small_streaming_setup
    sep = StreamingSeparator(c, variables, chunk_frames=20)
    st = sep.init_state(1)
    emb = np.zeros((1, 256), np.float32)
    chunk = np.zeros((1, sep.chunk_samples), np.float32)
    for _ in range(3):
        st, _ = sep.process_chunk(st, chunk, emb)
    assert sep._chunk_step._cache_size() == 1
    for name in ("sample_tail", "spec_hist", "phase_hist", "lstm_h", "lstm_c", "ola_tail"):
        assert getattr(st, name).dtype == np.float32, name


def test_threaded_state_one_compile_bf16_model(small_streaming_setup):
    """Same invariant with a bf16-compute model (the TPU default), whose
    raw LSTM carry comes back bf16 — the case that actually recompiled."""
    c0, _ = small_streaming_setup
    import dataclasses

    c = dataclasses.replace(c0)
    c.train_config = dataclasses.replace(c0.train_config, compute_dtype="bfloat16")
    model = make_masknet(c, streaming=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 601)), jnp.zeros((1, 256))
    )
    sep = StreamingSeparator(c, variables, chunk_frames=20)
    st = sep.init_state(1)
    emb = np.zeros((1, 256), np.float32)
    chunk = np.zeros((1, sep.chunk_samples), np.float32)
    for _ in range(3):
        st, out = sep.process_chunk(st, chunk, emb)
    assert sep._chunk_step._cache_size() == 1
    assert st.lstm_h.dtype == np.float32
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def causal_streaming_setup():
    c = Config()
    c.model_name = "voicesplit"
    c.model.lstm_dim = 24
    c.model.fc1_dim = 32
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.model.causal = True
    c.train_config.compute_dtype = "float32"
    model = make_masknet(c, streaming=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 601)), jnp.zeros((1, 256))
    )
    return c, variables


def test_causal_features_ignore_future(causal_streaming_setup):
    """With model.causal, frame t's conv features must be identical no
    matter what comes after t — the zero-lookahead guarantee."""
    c, variables = causal_streaming_setup
    model = make_masknet(c, streaming=True)
    assert model.conv_context_right == 0
    assert model.conv_context_left == 2 * model.conv_context
    rng = np.random.default_rng(3)
    T = 160
    spec = rng.uniform(0, 1, (1, T, 601)).astype(np.float32)
    full = model.apply(variables, jnp.asarray(spec), method=model.conv_features)
    # scramble everything after t: features at [0..t] must not move
    t = 100
    scrambled = spec.copy()
    scrambled[:, t + 1 :] = rng.uniform(0, 1, (1, T - t - 1, 601))
    full2 = model.apply(variables, jnp.asarray(scrambled), method=model.conv_features)
    np.testing.assert_allclose(
        np.asarray(full[:, : t + 1]), np.asarray(full2[:, : t + 1]), atol=1e-6
    )
    assert np.abs(np.asarray(full[:, t + 1 :]) - np.asarray(full2[:, t + 1 :])).max() > 1e-4


def test_causal_tail_frames_see_recent_input(causal_streaming_setup):
    """Regression: the causal pre-shift must not truncate the most recent
    inputs at the array end.  Without the internal shift-buffer frames,
    the last Σe (= conv_context) frames of ANY sequence silently read
    zeros in place of their newest inputs — so a window ending at frame t
    disagreed with the full pass at frame t by ~3e-2, and streaming
    chunk boundaries disagreed with offline causal inference."""
    c, variables = causal_streaming_setup
    model = make_masknet(c, streaming=True)
    ctx = model.conv_context_left
    rng = np.random.default_rng(5)
    T = 260
    spec = rng.uniform(0, 1, (1, T, 601)).astype(np.float32)
    full = model.apply(variables, jnp.asarray(spec), method=model.conv_features)
    for t in (ctx, 180, T - 1):
        win = spec[:, t - ctx : t + 1]  # window ENDING exactly at t
        feats = model.apply(variables, jnp.asarray(win), method=model.conv_features)
        np.testing.assert_allclose(
            np.asarray(feats[:, -1]), np.asarray(full[:, t]), atol=1e-6
        )


def test_causal_streaming_chunk_invariance_and_latency(causal_streaming_setup):
    c, variables = causal_streaming_setup
    sep20 = StreamingSeparator(c, variables, chunk_frames=20)
    sep60 = StreamingSeparator(c, variables, chunk_frames=60)
    # zero conv lookahead: only the STFT overlap remains
    assert sep20.latency_samples == 1200 - 160
    assert sep20.hist_frames == 2 * 65
    emb = np.random.default_rng(1).standard_normal((1, 256)).astype(np.float32)
    wav = _wav()[None]
    out_small = sep20.separate(wav, emb)
    out_large = sep60.separate(wav, emb)
    assert out_small.shape == out_large.shape == wav.shape
    np.testing.assert_allclose(out_small, out_large, atol=2e-4)


def test_causal_train_step_runs():
    """The causal STREAMING model (uni-LSTM) trains end-to-end — the
    deployable zero-lookahead configuration; the train/eval steps accept
    the streaming model's (mask, carry) output."""
    from voicesplit_tpu.data import BatchIterator, SeparationDataset, build_synthetic_dataset, discover_samples
    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step
    import tempfile

    c = Config()
    c.model.causal = True
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.audio.audio_len = 0.6
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    tmp = tempfile.mkdtemp()
    build_synthetic_dataset(tmp, 2, SR, c.audio.audio_len, seed=0)
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(discover_samples(tmp, c.dataset.format), ap, c.audio.audio_len)
    loader = BatchIterator(ds, 2, shuffle=False)
    model = make_masknet(c, streaming=True)
    tx = make_optimizer(c)
    state = create_train_state(c, model, jax.random.PRNGKey(0), (2, ds.n_frames, 601), tx)
    step = make_train_step(c, model, ap, tx, donate=False)
    state, metrics = step(state, next(loader))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_windowed_conv_features_match_full_pass(small_streaming_setup):
    """conv_context must cover the stack's true receptive field: features
    of a frame computed from a ±ctx window must EXACTLY equal the
    full-sequence features (this is what makes streaming ≡ offline on
    the conv stack; a too-small ctx fails this by ~1e-2)."""
    c, variables = small_streaming_setup
    model = make_masknet(c, streaming=True)
    ctx = model.conv_context
    T = 2 * ctx + 12
    rng = np.random.default_rng(7)
    spec = rng.uniform(0, 1, (1, T + 2 * ctx, 601)).astype(np.float32)

    full = model.apply(variables, jnp.asarray(spec), method=model.conv_features)
    # middle frame t: compute from its ±ctx window only
    for t in (ctx, ctx + 5, T + ctx - 1):
        window = spec[:, t - ctx : t + ctx + 1]
        feats = model.apply(variables, jnp.asarray(window), method=model.conv_features)
        np.testing.assert_allclose(
            np.asarray(feats[:, ctx]), np.asarray(full[:, t]), atol=1e-5
        )
