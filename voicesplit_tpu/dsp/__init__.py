"""TPU-native signal-processing front-end.

Replaces the reference's librosa/scipy/torchaudio DSP stack
(`utils/audio_processor.py`, `utils/stft.py`, `utils/audio.py`) with
jit-compiled JAX: the STFT and iSTFT are expressed as framed matmuls
against real/imag Fourier bases (MXU-friendly, sidesteps the awkward
non-power-of-2 n_fft=1200), overlap-add is a precomputed 0/1 matmul, and
Griffin-Lim is a `lax.fori_loop`.  Everything is differentiable end-to-end
— the training path backpropagates through `istft` (the reference's
`torch_inv_spectrogram`, `utils/audio_processor.py:498-509`).
"""

from voicesplit_tpu.dsp.windows import get_window, pad_center
from voicesplit_tpu.dsp.stft import (
    stft,
    istft,
    frame_signal,
    overlap_add,
    num_frames,
    stft_basis,
    istft_basis,
    window_sumsquare,
)
from voicesplit_tpu.dsp.normalize import (
    amp_to_db,
    db_to_amp,
    normalize_db,
    denormalize_db,
    preemphasis,
    inv_preemphasis,
)
from voicesplit_tpu.dsp.mel import mel_filterbank
from voicesplit_tpu.dsp.griffin_lim import griffin_lim
from voicesplit_tpu.dsp.processor import AudioProcessor, make_audio_processor
