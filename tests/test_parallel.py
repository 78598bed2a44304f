"""Sharding tests on the virtual 8-device CPU mesh.

The real multi-chip validation path is `__graft_entry__.dryrun_multichip`;
these tests pin the same machinery: DP batch sharding reproduces
single-device numerics, model-parallel specs compile and run, optimizer
moments follow param sharding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_train_state,
)
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step

SR = 16000


def _config(model_parallel=False):
    c = Config()
    c.model_name = "voicefilter"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.4
    c.model.lstm_dim = 32
    c.model.fc1_dim = 48
    c.model.conv_channels = 8
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 8
    c.train_config.compute_dtype = "float32"
    return c


def _batch(c, B, seed=0):
    rng = np.random.default_rng(seed)
    L = int(SR * c.audio.audio_len)
    return {
        "emb": rng.standard_normal((B, 256)).astype(np.float32),
        "target_wav": (0.1 * rng.standard_normal((B, L))).astype(np.float32),
        "mixed_wav": (0.2 * rng.standard_normal((B, L))).astype(np.float32),
        "wav_len": np.full((B,), L, np.int32),
        "seq_len": np.full((B,), 1, np.int32),
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def _setup(c):
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    L = int(SR * c.audio.audio_len)
    T = ap.frames_for(L)
    state = create_train_state(c, model, jax.random.PRNGKey(0), (2, T, 601), tx)
    step = make_train_step(c, model, ap, tx, donate=False)
    return ap, model, state, step


def test_dp_matches_single_device():
    """Same batch, sharded 8-way over data == run replicated (same math)."""
    c = _config()
    ap, model, state, step = _setup(c)
    batch = _batch(c, 8)

    _, m_single = step(state, batch)
    loss_single = float(jax.device_get(m_single)["loss"])

    mesh = make_mesh()
    sharded_state = shard_train_state(state, mesh)
    shardings = batch_sharding(mesh, batch)
    sharded_batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    new_state, m_dp = step(sharded_state, sharded_batch)
    loss_dp = float(jax.device_get(m_dp)["loss"])

    assert np.isclose(loss_single, loss_dp, rtol=2e-4), (loss_single, loss_dp)
    # params updated identically (XLA inserted the gradient reduction)
    _, m2 = step(new_state, sharded_batch)
    assert np.isfinite(float(jax.device_get(m2)["loss"]))


def test_model_parallel_specs_and_step():
    """Wide-variant sharding: gate dims over 'model'; step runs and matches."""
    c = _config()
    ap, model, state, step = _setup(c)
    specs = param_partition_spec(state.params, model_parallel=True)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {
        "/".join(p.key for p in path): spec for path, spec in flat
    }
    assert by_name["lstm/fwd_w_ih"] == P(None, "model")
    assert by_name["lstm/bwd_w_hh"] == P(None, "model")
    assert by_name["fc1/kernel"] == P("model", None)
    assert by_name["conv1/Conv_0/kernel"] == P(None, None, None, "model")

    batch = _batch(c, 8)
    _, m_single = step(state, batch)
    loss_single = float(jax.device_get(m_single)["loss"])

    mesh = make_mesh(data=4, model=2)
    sharded_state = shard_train_state(state, mesh, model_parallel=True)
    shardings = batch_sharding(mesh, batch)
    sharded_batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    new_state, m_mp = step(sharded_state, sharded_batch)
    loss_mp = float(jax.device_get(m_mp)["loss"])
    assert np.isclose(loss_single, loss_mp, rtol=2e-4), (loss_single, loss_mp)


def test_opt_state_follows_param_sharding():
    c = _config()
    ap, model, state, step = _setup(c)
    mesh = make_mesh(data=4, model=2)
    sharded = shard_train_state(state, mesh, model_parallel=True)
    # find adam mu for lstm fwd_w_ih and check its sharding spec
    mu = sharded.opt_state[0].mu["lstm"]["fwd_w_ih"]
    assert mu.sharding.spec == P(None, "model")


def test_batch_sharding_specs():
    c = _config()
    mesh = make_mesh()
    sh = batch_sharding(mesh, _batch(c, 8))
    assert sh["mixed_wav"].spec == P("data", None)
    assert sh["wav_len"].spec == P("data")
