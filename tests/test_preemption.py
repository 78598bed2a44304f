"""Preemption-safe training: SIGTERM/SIGINT → checkpoint at next step
boundary → clean exit → exact resume.

New capability (SURVEY.md §5 failure-detection row): the reference's only
recovery is manual resume (`train.py:40-60`); preemptible TPU slices get
SIGTERM with a grace window, which `Trainer.fit` turns into a mid-epoch
checkpoint carrying the data-iterator state.
"""

import os
import signal
import threading

import pytest

from voicesplit_tpu.config import Config
from voicesplit_tpu.data import build_synthetic_dataset
from voicesplit_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from voicesplit_tpu.train.trainer import Trainer

SR = 16000


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt")
    c = Config()
    c.model_name = "voicefilter"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.6
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    c.train_config.summary_interval = 2
    c.train_config.checkpoint_interval = 1000  # only preemption saves
    c.train_config.epochs = 10000
    c.dataset.train_dir = str(root / "train")
    c.dataset.test_dir = str(root / "test")
    build_synthetic_dataset(c.dataset.train_dir, 6, SR, c.audio.audio_len, seed=0)
    build_synthetic_dataset(c.dataset.test_dir, 2, SR, c.audio.audio_len, seed=9)
    return root, c


def _trainer(c, log_dir, checkpoint_path=None):
    c.train_config.logs_path = str(log_dir)
    return Trainer(
        c, checkpoint_path=checkpoint_path, log_dir=str(log_dir),
        enable_tb=False, prefetch_depth=0,
    )


def test_programmatic_preemption_checkpoints_and_stops(workspace, tmp_path):
    root, c = workspace
    tr = _trainer(c, tmp_path / "logs")
    tr.request_preemption()
    res = tr.fit(max_steps=50, validate_at_epoch_start=False)
    assert res.get("preempted") is True
    assert res["step"] == 1  # stopped at the first boundary
    ckpt = latest_checkpoint(str(tmp_path / "logs"))
    assert ckpt is not None and ckpt.endswith("checkpoint_1.msgpack")
    payload = load_checkpoint(ckpt)
    assert int(payload["step"]) == 1
    # the data-iterator state rode along for mid-epoch resume
    assert payload["data_state"]["position"] >= 1


def test_sigterm_mid_run_checkpoints_and_stops(workspace, tmp_path):
    root, c = workspace
    tr = _trainer(c, tmp_path / "logs_sig")
    prev_handler = signal.getsignal(signal.SIGTERM)
    pid = os.getpid()
    timer = threading.Timer(0.7, lambda: os.kill(pid, signal.SIGTERM))
    timer.start()
    try:
        res = tr.fit(max_steps=100000, validate_at_epoch_start=False)
    finally:
        timer.cancel()
    assert res.get("preempted") is True
    ckpt = latest_checkpoint(str(tmp_path / "logs_sig"))
    assert ckpt is not None
    assert int(load_checkpoint(ckpt)["step"]) == res["step"]
    # fit() restored the handler that was installed before it ran
    # (== — bound methods compare by function+instance; `is` on a fresh
    # bound-method object would be vacuously True for `is not`)
    assert signal.getsignal(signal.SIGTERM) == prev_handler


def test_second_signal_escalates(workspace, tmp_path):
    root, c = workspace
    tr = _trainer(c, tmp_path / "logs_esc")
    tr._handle_signal(signal.SIGTERM, None)
    assert tr._preempt_requested
    with pytest.raises(KeyboardInterrupt):
        tr._handle_signal(signal.SIGTERM, None)


def test_resume_after_preemption_continues(workspace, tmp_path):
    root, c = workspace
    log_dir = tmp_path / "logs_resume"
    tr = _trainer(c, log_dir)
    res = tr.fit(max_steps=3, validate_at_epoch_start=False)
    assert res["step"] == 3 and "preempted" not in res
    tr.request_preemption()
    res = tr.fit(max_steps=50, validate_at_epoch_start=False)
    assert res.get("preempted") is True and res["step"] == 4

    # the preemption checkpoint exists at step 4
    ckpt_preempt = latest_checkpoint(str(log_dir))
    assert ckpt_preempt.endswith("checkpoint_4.msgpack")

    # the flag was cleared by the preemption path: a later fit() on the
    # SAME trainer trains instead of instantly re-preempting (ADVICE r1);
    # a normal completion off an interval boundary saves a FINAL checkpoint
    res_again = tr.fit(max_steps=6, validate_at_epoch_start=False)
    assert "preempted" not in res_again and res_again["step"] == 6

    ckpt = latest_checkpoint(str(log_dir))
    assert ckpt.endswith("checkpoint_6.msgpack")
    tr2 = _trainer(c, log_dir, checkpoint_path=ckpt)
    import jax

    assert int(jax.device_get(tr2.state.step)) == 6
    res2 = tr2.fit(max_steps=8, validate_at_epoch_start=False)
    assert res2["step"] == 8 and "preempted" not in res2
