"""Flax model zoo.

- `MaskNet` — the dilated-conv + BiLSTM spectrogram-mask network.  One
  module covers both reference models: `activation="relu"` is VoiceFilter
  (reference `models/voicefilter/model.py`), `activation="mish"` is
  VoiceSplit (reference `models/voicesplit/model.py` — the two reference
  files are 98% identical).
- `LSTM` / `BiLSTM` — `lax.scan` LSTM with the input projection hoisted
  out of the scan as one big MXU matmul; unidirectional mode exposes its
  carry for streaming inference.
- `SpeakerEncoder` — the GE2E d-vector extractor topology used by the
  reference's offline embedding notebooks.
"""

from voicesplit_tpu.models.lstm import LSTM, BiLSTM, UniLSTM
from voicesplit_tpu.models.masknet import MaskNet, make_masknet
from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder
