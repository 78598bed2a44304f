"""voicesplit_tpu — a TPU-native targeted-voice-separation framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
Edresson/VoiceSplit (an unofficial VoiceFilter implementation): given the
magnitude spectrogram of a two-speaker mixture and a d-vector of the target
speaker, a dilated-conv + BiLSTM network predicts a soft spectrogram mask
isolating the target voice.  Training uses power-law-compressed spectral loss
or SI-SNR-with-PIT through a differentiable iSTFT; evaluation reports
SDR / SI-SNR.

Layering (see SURVEY.md for the reference analysis this build follows):

  config    — typed config schema + JSON-with-comments loader
  dsp       — STFT / iSTFT / mel / Griffin-Lim as MXU matmuls (+ Pallas)
  models    — flax mask network (conv stack + scan BiLSTM), speaker encoder
  losses    — power-law compressed loss, vectorized SI-SNR with PIT
  data      — overlap-mixing pipeline, triplet datasets, samplers
  train     — jit train/eval steps, checkpointing, metrics
  eval      — SI-SNR / SDR metrics, checkpoint sweeps
  parallel  — device meshes, sharding rules, multi-host helpers
  streaming — chunked low-latency inference with LSTM state carry
"""

__version__ = "0.1.0"

from voicesplit_tpu.config import Config, load_config  # noqa: F401
