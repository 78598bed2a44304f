"""Wide-variant (BASELINE config 4): 2x LSTM hidden + deeper dilated
stack, model-parallel over 2 mesh devices — compiles, steps, matches the
unsharded numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.parallel import batch_sharding, make_mesh, shard_train_state
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step

SR = 16000


def test_wide_variant_model_parallel_step():
    c = Config()
    c.model_name = "voicesplit"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.4
    c.model.lstm_dim = 64  # "2x hidden" at test scale
    c.model.fc1_dim = 48
    c.model.conv_channels = 8
    c.model.conv_out_channels = 2
    c.model.num_extra_dilated_blocks = 1  # deeper stack (dilation 32)
    c.train_config.batch_size = 4
    c.train_config.compute_dtype = "float32"

    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    assert model.conv_context == 65 + 64  # extra block widens the context
    tx = make_optimizer(c)
    L = int(SR * c.audio.audio_len)
    T = ap.frames_for(L)
    state = create_train_state(c, model, jax.random.PRNGKey(0), (4, T, 601), tx)
    step = make_train_step(c, model, ap, tx, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "emb": rng.standard_normal((4, 256)).astype(np.float32),
        "target_wav": (0.1 * rng.standard_normal((4, L))).astype(np.float32),
        "mixed_wav": (0.2 * rng.standard_normal((4, L))).astype(np.float32),
        "wav_len": np.full((4,), L, np.int32),
        "seq_len": np.full((4,), T, np.int32),
    }
    _, m_ref = step(state, batch)
    loss_ref = float(jax.device_get(m_ref)["loss"])

    mesh = make_mesh(data=4, model=2)
    sharded = shard_train_state(state, mesh, model_parallel=True)
    sh = batch_sharding(mesh, batch)
    sbatch = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    new_state, m = step(sharded, sbatch)
    loss = float(jax.device_get(m)["loss"])
    assert np.isclose(loss, loss_ref, rtol=2e-4), (loss, loss_ref)
    # the deeper conv block's params exist and got sharded
    extra = new_state.params["conv8"]["Conv_0"]["kernel"]
    assert extra.shape[:2] == (5, 5)
