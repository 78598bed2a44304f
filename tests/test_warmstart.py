"""BiLSTM → streaming warm-start (VERDICT r1 weak #4).

Trains a tiny offline BiLSSTM model, converts the checkpoint with
`bilstm_to_streaming_sd` / `convert_bilstm_checkpoint_to_streaming`, and
verifies (a) the converted checkpoint loads into the streaming model and
(b) fine-tuning from it beats training the causal model from scratch at
equal steps — the point of the shortcut.
"""

import numpy as np
import pytest

import jax

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step
from voicesplit_tpu.train.checkpoint import (
    bilstm_to_streaming_sd,
    convert_bilstm_checkpoint_to_streaming,
    load_checkpoint,
    save_checkpoint,
)

SR = 16000


def _tiny_config():
    c = Config()
    c.model_name = "voicesplit"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.4
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    c.train_config.learning_rate = 1e-3
    return c


def _fixed_batch(c, seed=0):
    rng = np.random.default_rng(seed)
    B = c.train_config.batch_size
    L = int(SR * c.audio.audio_len)
    target = 0.1 * rng.standard_normal((B, L)).astype(np.float32)
    mixed = target + 0.1 * rng.standard_normal((B, L)).astype(np.float32)
    return {
        "emb": rng.standard_normal((B, 256)).astype(np.float32),
        "target_wav": target,
        "mixed_wav": mixed,
        "wav_len": np.full((B,), L, np.int32),
    }


def _train(c, streaming, batch, steps, init_state=None, seed=0):
    ap = AudioProcessor(c.audio)
    model = make_masknet(c, streaming=streaming)
    tx = make_optimizer(c)
    L = int(ap.sample_rate * c.audio.audio_len)
    T = ap.frames_for(L)
    state = init_state or create_train_state(
        c, model, jax.random.PRNGKey(seed),
        (c.train_config.batch_size, T, c.audio.active.num_freq), tx,
    )
    step_fn = make_train_step(c, model, ap, tx, donate=False)
    loss = None
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        loss = float(jax.device_get(metrics["loss"]))
    return state, loss


@pytest.fixture(scope="module")
def trained_bilstm(tmp_path_factory):
    c = _tiny_config()
    batch = _fixed_batch(c)
    state, loss = _train(c, streaming=False, batch=batch, steps=60)
    log_dir = str(tmp_path_factory.mktemp("bilstm"))
    path = save_checkpoint(log_dir, state, c)
    return c, batch, path, loss


def test_convert_shapes_and_fc1_collapse(trained_bilstm):
    c, _, path, _ = trained_bilstm
    payload = load_checkpoint(path)
    sd = bilstm_to_streaming_sd(payload["model"], c.model.lstm_dim)
    H = c.model.lstm_dim
    assert set(sd["lstm"]) == {"fwd_w_ih", "fwd_w_hh", "fwd_b"}
    np.testing.assert_allclose(
        sd["fc1"]["kernel"],
        np.asarray(payload["model"]["fc1"]["kernel"][:H])
        + np.asarray(payload["model"]["fc1"]["kernel"][H:]),
    )
    assert sd["conv1"] is payload["model"]["conv1"]  # untouched passthrough


def test_convert_rejects_non_bilstm(trained_bilstm):
    c, _, path, _ = trained_bilstm
    payload = load_checkpoint(path)
    with pytest.raises(ValueError, match="not a BiLSTM"):
        bilstm_to_streaming_sd(payload["model"], c.model.lstm_dim * 2)


def test_warmstart_beats_from_scratch(trained_bilstm, tmp_path):
    c, batch, path, bilstm_loss = trained_bilstm
    out = convert_bilstm_checkpoint_to_streaming(path, str(tmp_path / "stream"))
    payload = load_checkpoint(out)
    assert int(payload["step"]) == 0

    import flax.serialization

    from voicesplit_tpu.config import load_config_from_str

    cs = load_config_from_str(payload["config_str"])
    assert cs.model.causal is True

    # build the streaming state from the converted payload
    ap = AudioProcessor(cs.audio)
    model = make_masknet(cs, streaming=True)
    tx = make_optimizer(cs)
    T = ap.frames_for(int(SR * cs.audio.audio_len))
    template = create_train_state(
        cs, model, jax.random.PRNGKey(0),
        (cs.train_config.batch_size, T, cs.audio.active.num_freq), tx,
    )
    params = flax.serialization.from_state_dict(template.params, payload["model"])
    bstats = flax.serialization.from_state_dict(template.batch_stats, payload["batch_stats"])
    warm_state = template.replace(params=params, batch_stats=bstats,
                                  opt_state=tx.init(params))

    fine_tune_steps = 25
    _, warm_loss = _train(cs, True, batch, fine_tune_steps, init_state=warm_state)
    _, cold_loss = _train(cs, True, batch, fine_tune_steps, seed=1)
    assert np.isfinite(warm_loss) and np.isfinite(cold_loss)
    # the converted start must beat from-scratch at equal steps
    assert warm_loss < cold_loss, (warm_loss, cold_loss)


def test_cli_convert_streaming(trained_bilstm, tmp_path):
    from voicesplit_tpu.cli.convert_streaming import main as cs_main

    _, _, path, _ = trained_bilstm
    out = tmp_path / "cli_stream"
    cs_main(["--checkpoint_path", path, "--output_dir", str(out)])
    ckpts = sorted(out.glob("checkpoint_*.msgpack"))
    assert len(ckpts) == 1
