"""NaN-triage mode (`Trainer(debug_nans=True)` / `cli.train --debug_nans`):
the explosion guard is checked every step and the failing step is re-run
unjitted under `jax_debug_nans`, so the report NAMES the first
NaN-producing op instead of just reporting "loss exploded"
(SURVEY.md §5's sanitizer row; VERDICT r1 missing #5).
"""

import numpy as np

from voicesplit_tpu.config import Config
from voicesplit_tpu.data.dataset import IteratorState
from voicesplit_tpu.train.trainer import Trainer

SR = 16000


class _SyntheticLoader:
    """Minimal loader: clean batches, with batch #`poison_at` carrying a
    NaN in the mixed waveform."""

    def __init__(self, B, L, poison_at=None):
        self.B, self.L = B, L
        self.poison_at = poison_at
        self.count = 0
        self.rng = np.random.default_rng(0)

    def batches_per_epoch(self):
        return 1000

    @property
    def state(self):
        return IteratorState()

    def load_state(self, state):
        pass

    def __iter__(self):
        return self

    def __next__(self):
        B, L = self.B, self.L
        target = 0.05 * self.rng.standard_normal((B, L)).astype(np.float32)
        mixed = target + 0.05 * self.rng.standard_normal((B, L)).astype(np.float32)
        if self.poison_at is not None and self.count == self.poison_at:
            mixed[0, 7] = np.nan
        self.count += 1
        return {
            "emb": self.rng.standard_normal((B, 256)).astype(np.float32),
            "target_wav": target,
            "mixed_wav": mixed,
            "wav_len": np.full((B,), L, np.int32),
        }


def _tiny_config(tmp_path):
    c = Config()
    c.model_name = "voicefilter"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.4
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    c.train_config.summary_interval = 1000  # triage must NOT depend on it
    c.train_config.checkpoint_interval = 10000
    c.train_config.logs_path = str(tmp_path / "logs")
    return c


def test_poisoned_batch_names_the_op(tmp_path):
    c = _tiny_config(tmp_path)
    L = int(SR * c.audio.audio_len)
    loader = _SyntheticLoader(c.train_config.batch_size, L, poison_at=2)
    tr = Trainer(
        c, train_loader=loader, eval_loader=loader,
        enable_tb=False, prefetch_depth=0, debug_nans=True,
    )
    res = tr.fit(max_steps=10, validate_at_epoch_start=False)
    assert res.get("exploded") is True
    assert res["step"] == 3  # caught AT the poisoned step, not at summary
    report = res.get("nan_report", "")
    assert "nan" in report.lower()
    # the traceback reaches into the step body (op localization)
    assert "FloatingPointError" in report or "invalid value" in report


def test_guard_check_interval_independent_of_summary(tmp_path):
    """Without debug mode, the guard still trips within check_interval
    steps even though summary_interval is huge (ADVICE r1 / weak #3)."""
    c = _tiny_config(tmp_path)
    c.train_config.check_interval = 4
    L = int(SR * c.audio.audio_len)
    loader = _SyntheticLoader(c.train_config.batch_size, L, poison_at=0)
    tr = Trainer(
        c, train_loader=loader, eval_loader=loader,
        enable_tb=False, prefetch_depth=0,
    )
    res = tr.fit(max_steps=50, validate_at_epoch_start=False)
    assert res.get("exploded") is True
    assert res["step"] == 4  # first check boundary, NOT summary_interval
    assert "nan_report" not in res
