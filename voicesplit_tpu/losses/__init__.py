"""Training losses: power-law compressed spectral loss and SI-SNR with PIT."""

from voicesplit_tpu.losses.power_law import power_law_compressed_loss
from voicesplit_tpu.losses.si_snr import si_snr, si_snr_with_pit, sequence_mask
