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
    # ctx*hop + (n_fft - hop) at voicefilter params = 32*160 + 1040
    assert sep.latency_samples == 32 * 160 + (1200 - 160)
