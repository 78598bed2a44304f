"""AOT export round-trips (`voicesplit_tpu/export.py`).

Load-bearing property: a serialized artifact, deserialized cold,
computes exactly what the live model computes — weights, DSP, and mask
net all inside one portable program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.export import (
    export_separator,
    export_streaming,
    load_exported,
    make_e2e_separation_fn,
)
from voicesplit_tpu.models.masknet import make_masknet

SR = 16000


def _small_config(streaming=False):
    c = Config()
    c.model_name = "voicesplit"
    c.model.lstm_dim = 24
    c.model.fc1_dim = 32
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.compute_dtype = "float32"
    model = make_masknet(c, streaming=streaming)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 40, 601)), jnp.zeros((1, 256))
    )
    return c, variables


def test_export_separator_roundtrip(tmp_path):
    c, variables = _small_config()
    data = export_separator(c, variables, seconds=1.0)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000

    fn = load_exported(data)
    rng = np.random.default_rng(0)
    # symbolic batch: call with B=2 and B=3
    for B in (2, 3):
        wav = (0.1 * rng.standard_normal((B, SR))).astype(np.float32)
        emb = rng.standard_normal((B, 256)).astype(np.float32)
        out = np.asarray(fn(wav, emb))
        ref = np.asarray(make_e2e_separation_fn(c, variables)(wav, emb))
        assert out.shape == (B, SR)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    # save/load through a file
    from voicesplit_tpu.export import load_artifact, save_artifact

    p = str(tmp_path / "sep.stablehlo")
    save_artifact(p, data, manifest={"kind": "e2e"})
    fn2 = load_artifact(p)
    wav = (0.1 * rng.standard_normal((2, SR))).astype(np.float32)
    emb = rng.standard_normal((2, 256)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fn2(wav, emb)), np.asarray(fn(wav, emb)), atol=1e-6
    )


def test_export_streaming_roundtrip():
    c, variables = _small_config(streaming=True)
    from voicesplit_tpu.streaming import StreamingSeparator

    data, manifest = export_streaming(c, variables, chunk_frames=20, batch_size=1)
    assert manifest["chunk_samples"] == 20 * 160
    step = load_exported(data)

    sep = StreamingSeparator(c, variables, chunk_frames=20)
    state = sep.init_state(1)
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((1, 256)).astype(np.float32)

    leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
    for i in range(3):
        samples = (0.1 * rng.standard_normal((1, sep.chunk_samples))).astype(np.float32)
        state, ref_out = sep.process_chunk(state, samples, emb)
        outs = step(*leaves, samples, emb)
        leaves, out = [np.asarray(x) for x in outs[:-1]], np.asarray(outs[-1])
        np.testing.assert_allclose(out, np.asarray(ref_out), atol=1e-5,
                                   err_msg=f"chunk {i}")
    for a, b in zip(leaves, jax.tree.leaves(state)):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)
