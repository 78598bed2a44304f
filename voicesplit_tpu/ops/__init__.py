"""Pallas TPU kernels for the hot ops.

`fused_lstm_scan` — the recurrent half of the LSTM as a single Pallas
kernel: weights resident in VMEM across the whole time loop, gates fused
on the VPU, custom VJP with an in-kernel weight-gradient accumulator.
Falls back to the `lax.scan` implementation on non-TPU backends.
"""

from voicesplit_tpu.ops.lstm_pallas import fused_lstm_scan, pallas_lstm_available
