"""Evaluation: SDR/SI-SNR metrics, validation loop, checkpoint sweeps."""

from voicesplit_tpu.eval.metrics import (
    bss_eval_sdr,
    bss_eval_sdr_batch,
    si_snr_improvement,
    si_snr_improvement_batch,
)
from voicesplit_tpu.eval.validation import validate
from voicesplit_tpu.eval.sweep import sweep_checkpoints
