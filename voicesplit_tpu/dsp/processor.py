"""Audio-processor facade: one class, three backend behaviors.

The reference wraps three audio processors behind
`WrapperAudioProcessor` (`utils/audio_processor.py:19-59`):

- ``voicefilter`` (default) — `openVoiceFilterAudioProcessor`
  (`utils/audio_processor.py:440-567`): 16 kHz, n_fft 1200 / hop 160 /
  win 400, dB-normalize against min_level_db.
- ``wavernn`` — `WaveRNNAudioProcessor` (`:61-336`): ms-based STFT params,
  preemphasis, optional mel spectrograms, symmetric/clip normalize.
- ``waveglow`` — `WaveGlowAudioProcessor` (`:338-438`): conv1d-STFT mel
  extraction with dynamic-range log compression.

Here the shared DSP core is `voicesplit_tpu.dsp.stft` (MXU matmuls) and
this facade binds backend-specific normalization semantics around it.
Methods come in two flavors:

- numpy-in/numpy-out host conveniences mirroring the reference API
  (`wav2spec`, `spec2wav`, `get_mel`, `load_wav`, `save_wav`), which call
  cached jit functions under the hood;
- pure jnp batch functions for the training path (`spec2wav_batch` — the
  differentiable iSTFT the reference calls `torch_inv_spectrogram`,
  `utils/audio_processor.py:498-509` — and `wav2spec_batch`), safe to use
  inside a jitted train step.
"""

from __future__ import annotations

from functools import cached_property, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voicesplit_tpu.config import AudioConfig, Config
from voicesplit_tpu.dsp import audio_io
from voicesplit_tpu.dsp.griffin_lim import griffin_lim
from voicesplit_tpu.dsp.mel import mel_filterbank
from voicesplit_tpu.dsp.normalize import (
    amp_to_db,
    db_to_amp,
    denormalize_db,
    inv_preemphasis,
    normalize_db,
    preemphasis,
)
from voicesplit_tpu.dsp.stft import istft_magphase, stft, stft_magphase


class AudioProcessor:
    """Backend-dispatching audio front-end.

    Construct from an `AudioConfig` (or via `make_audio_processor(config)`).
    `synthesis_window` selects the iSTFT window for the differentiable
    training path: the reference analyzes with periodic hann but
    synthesizes the training path with symmetric hamming
    (`utils/audio_processor.py:509`) — a mismatched analysis/synthesis
    pair.  We default to matched ``hann`` (correct reconstruction) and
    keep ``hamming`` available for bit-parity experiments.
    """

    def __init__(self, audio: AudioConfig, synthesis_window: str = "hann"):
        self.config = audio
        self.backend = audio.backend
        if self.backend not in ("voicefilter", "wavernn", "waveglow"):
            raise ValueError(f"unknown audio backend {self.backend!r}")
        self.params = audio.active
        self.synthesis_window = synthesis_window

        p = self.params
        self.sample_rate = p.sample_rate
        self.n_fft = p.n_fft
        self.hop_length = p.hop_length
        self.win_length = p.win_length
        self.num_freq = p.num_freq
        self.min_level_db = float(getattr(p, "min_level_db", -100.0))
        self.ref_level_db = float(getattr(p, "ref_level_db", 20.0))
        self.griffin_lim_iters = int(getattr(p, "griffin_lim_iters", 60))
        self.power = float(getattr(p, "power", 1.5))
        self.preemph = float(getattr(p, "preemphasis", 0.0)) if self.backend == "wavernn" else 0.0
        self.mel_spec = bool(audio.mel_spec)

    # ------------------------------------------------------------------
    # Derived constants
    # ------------------------------------------------------------------

    @cached_property
    def mel_basis(self) -> np.ndarray:
        p = self.params
        if self.backend == "voicefilter":
            # reference `utils/audio_processor.py:456-458`: full-band, 40 mels
            return mel_filterbank(self.sample_rate, self.n_fft, p.num_mels)
        if self.backend == "wavernn":
            return mel_filterbank(self.sample_rate, self.n_fft, p.num_mels, p.mel_fmin, p.mel_fmax)
        return mel_filterbank(self.sample_rate, self.n_fft, p.n_mel_channels, p.mel_fmin, p.mel_fmax)

    # ------------------------------------------------------------------
    # Pure jnp batch transforms (training-path safe)
    # ------------------------------------------------------------------

    def wav2spec_batch(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Waveforms ``[..., L]`` → ``(norm_spec, phase)`` each ``[..., T, F]``.

        voicefilter semantics (reference `utils/audio_processor.py:469-476`):
        ``normalize(amp_to_db(|STFT|) - ref_level_db)`` and the raw phase.
        wavernn/waveglow backends apply their own normalization, and with
        ``mel_spec=True`` return mel spectrograms (reference
        `spectrogram`/`melspectrogram`, `utils/audio_processor.py:201-215`).
        """
        if self.backend == "wavernn" and self.preemph != 0.0:
            y = preemphasis(y, self.preemph)
        mag, phase = stft_magphase(y, self.n_fft, self.hop_length, self.win_length)
        if self.backend == "voicefilter":
            S = amp_to_db(mag) - self.ref_level_db
            return normalize_db(S, self.min_level_db), phase
        if self.mel_spec:
            mag = jnp.einsum(
                "mf,...tf->...tm", jnp.asarray(self.mel_basis), mag,
                precision=jax.lax.Precision.HIGHEST,
            )
        if self.backend == "waveglow":
            # reference WaveGlow dynamic-range compression: natural-log
            # magnitudes, ln(clamp(x, 1e-5)), NO dB/[0,1] normalization
            # (`utils/audio.py:49-61`, `utils/audio_processor.py:361-373`)
            return jnp.log(jnp.maximum(mag, 1e-5)), phase
        S = self._amp_to_db_floored(mag) - self.ref_level_db
        return self._normalize_generic(S), phase

    def mag_to_mel(self, mag: jnp.ndarray) -> jnp.ndarray:
        """Linear magnitudes ``[..., T, F]`` → mel ``[..., T, M]`` (the
        reference exposes this for WaveGlow vocoder use, `config.json:45`)."""
        return jnp.einsum(
            "mf,...tf->...tm", jnp.asarray(self.mel_basis), mag,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mel_to_linear(self, mel: jnp.ndarray) -> jnp.ndarray:
        """Pseudo-inverse mel→linear (reference `_mel_to_linear`,
        `utils/audio_processor.py:125-127`)."""
        pinv = np.linalg.pinv(self.mel_basis)
        out = jnp.einsum(
            "fm,...tm->...tf", jnp.asarray(pinv), mel,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.maximum(1e-10, out)

    def spec2wav_batch(
        self, spec: jnp.ndarray, phase: jnp.ndarray, length: Optional[int] = None
    ) -> jnp.ndarray:
        """Differentiable mixed-phase inversion, ``[..., T, F]`` → ``[..., L]``.

        The SI-SNR training path (reference `torch_inv_spectrogram`,
        `utils/audio_processor.py:498-509`): denormalize, dB→amp, iSTFT
        with the provided (mixture) phase.
        """
        if self.backend == "voicefilter":
            mag = db_to_amp(denormalize_db(spec, self.min_level_db) + self.ref_level_db)
        elif self.backend == "waveglow":
            mag = jnp.exp(spec)  # inverse dynamic-range compression
        else:
            mag = db_to_amp(self._denormalize_generic(spec) + self.ref_level_db)
        if self.backend != "voicefilter" and self.mel_spec:
            # mel backends: project back to linear frequency before the
            # iSTFT (the host path does this too); without it the
            # [..., T, n_mels] magnitudes can't meet the [..., T, F] phase
            mag = self.mel_to_linear(mag)
        wav = istft_magphase(
            mag, phase, self.n_fft, self.hop_length, self.win_length,
            window=self.synthesis_window, length=length,
        )
        if self.backend == "wavernn" and self.preemph != 0.0:
            wav = inv_preemphasis(wav, self.preemph)
        return wav

    def mel_batch(self, y: jnp.ndarray) -> jnp.ndarray:
        """GE2E mels: ``log10(mel @ |STFT|^2 + 1e-6)`` as ``[..., n_mels, T]``.

        (reference `get_mel`, `utils/audio_processor.py:460-467`).
        """
        real, imag = stft(y, self.n_fft, self.hop_length, self.win_length)
        power = real * real + imag * imag
        mel = jnp.einsum(
            "mf,...tf->...mt",
            jnp.asarray(self.mel_basis),
            power,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.log10(mel + 1e-6)

    def griffin_lim_batch(self, mag: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        return griffin_lim(
            mag, self.n_fft, self.hop_length, self.win_length,
            n_iters=self.griffin_lim_iters, key=key,
        )

    # --- backend-specific normalize helpers (wavernn/waveglow semantics) ---

    def _amp_to_db_floored(self, x):
        # wavernn floors at db_to_amp(min_level_db) (reference `:184-186`)
        min_level = float(np.exp(self.min_level_db / 20 * np.log(10)))
        return 20.0 * jnp.log10(jnp.maximum(min_level, x))

    def _normalize_generic(self, S):
        p = self.params
        if not getattr(p, "signal_norm", True):
            return S
        max_norm = float(getattr(p, "max_norm", 1.0))
        S_norm = (S - self.min_level_db) / -self.min_level_db
        if getattr(p, "symmetric_norm", False):
            S_norm = 2 * max_norm * S_norm - max_norm
            if getattr(p, "clip_norm", True):
                S_norm = jnp.clip(S_norm, -max_norm, max_norm)
        else:
            S_norm = max_norm * S_norm
            if getattr(p, "clip_norm", True):
                S_norm = jnp.clip(S_norm, 0.0, max_norm)
        return S_norm

    def _denormalize_generic(self, S):
        p = self.params
        if not getattr(p, "signal_norm", True):
            return S
        max_norm = float(getattr(p, "max_norm", 1.0))
        if getattr(p, "symmetric_norm", False):
            if getattr(p, "clip_norm", True):
                S = jnp.clip(S, -max_norm, max_norm)
            return (S + max_norm) * -self.min_level_db / (2 * max_norm) + self.min_level_db
        if getattr(p, "clip_norm", True):
            S = jnp.clip(S, 0.0, max_norm)
        return S * -self.min_level_db / max_norm + self.min_level_db

    # ------------------------------------------------------------------
    # Host-convenience API (numpy in / numpy out), mirroring the reference
    # ------------------------------------------------------------------

    @cached_property
    def _jit_wav2spec(self):
        return jax.jit(self.wav2spec_batch)

    @cached_property
    def _jit_spec2wav(self):
        return jax.jit(self.spec2wav_batch)

    @cached_property
    def _jit_mel(self):
        return jax.jit(self.mel_batch)

    @cached_property
    def _jit_griffin_lim(self):
        return jax.jit(self.griffin_lim_batch)

    def wav2spec(self, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """``[L]`` → ``(spec [T, F], phase [T, F])`` — reference `wav2spec`."""
        spec, phase = self._jit_wav2spec(jnp.asarray(y, jnp.float32))
        return np.asarray(spec), np.asarray(phase)

    def get_spec_from_audio(self, y: np.ndarray):
        return self.wav2spec(y)

    def get_spec_from_audio_path(self, path: str):
        return self.wav2spec(self.load_wav(path))

    def spec2wav(self, spec: np.ndarray, phase: Optional[np.ndarray] = None) -> np.ndarray:
        """``[T, F]`` → waveform.  With phase: mixed-phase iSTFT; without:

        Griffin-Lim on ``S**power`` (reference `spec2wav`,
        `utils/audio_processor.py:483-496`).
        """
        spec = jnp.asarray(spec, jnp.float32)
        if phase is not None:
            return np.asarray(self._jit_spec2wav(spec, jnp.asarray(phase, jnp.float32)))
        if self.backend == "voicefilter":
            mag = db_to_amp(denormalize_db(spec, self.min_level_db) + self.ref_level_db)
        elif self.backend == "waveglow":
            mag = jnp.exp(spec)  # inverse dynamic-range compression
        else:
            mag = db_to_amp(self._denormalize_generic(spec) + self.ref_level_db)
        if self.backend != "voicefilter" and self.mel_spec:
            # mel → linear before Griffin-Lim (reference `inv_mel_spectrogram`,
            # `utils/audio_processor.py:250-259`)
            mag = self.mel_to_linear(mag)
        mag = mag**self.power
        wav = np.asarray(self._jit_griffin_lim(mag))
        if self.backend == "wavernn" and self.preemph != 0.0:
            wav = np.asarray(inv_preemphasis(jnp.asarray(wav), self.preemph))
        return wav

    def inv_spectrogram(self, spec: np.ndarray, phase: Optional[np.ndarray] = None) -> np.ndarray:
        return self.spec2wav(spec, phase)

    def get_mel(self, y: np.ndarray) -> np.ndarray:
        """``[L]`` → log-mel ``[n_mels, T]`` for the GE2E speaker encoder."""
        return np.asarray(self._jit_mel(jnp.asarray(y, jnp.float32)))

    def get_mel_bucketed(self, y: np.ndarray, bucket_s: float = 1.0) -> np.ndarray:
        """`get_mel` with the wav zero-padded to the next ``bucket_s``
        length grid, so a corpus of arbitrary-length utterances reuses
        ONE compiled program per bucket instead of recompiling per
        distinct length (each remote TPU compile is ~30 s; a speaker
        corpus has about as many lengths as files).  Only the true
        length's frames are returned; the last couple of frames can
        differ slightly from `get_mel` (the STFT edge reflection sees
        the zero pad), which is immaterial for encoder features."""
        y = np.asarray(y, np.float32)
        L = len(y)
        step = max(1, int(round(self.sample_rate * bucket_s)))
        Lb = max(step, -(-L // step) * step)
        if Lb != L:
            y = np.pad(y, (0, Lb - L))
        mel = np.asarray(self._jit_mel(jnp.asarray(y, jnp.float32)))
        return mel[:, : self.frames_for(L)]

    def load_wav(self, path: str) -> np.ndarray:
        wav = audio_io.load_wav(path, self.sample_rate)
        if self.backend == "wavernn" and getattr(self.params, "do_trim_silence", False):
            margin = int(self.sample_rate * 0.1)
            if len(wav) > 2 * margin:  # clips under 0.2 s can't afford the margin
                wav = wav[margin:-margin]
            wav, _ = audio_io.trim_silence(wav, top_db=40, frame_length=1024, hop_length=256)
        return wav

    def save_wav(self, wav: np.ndarray, path: str) -> None:
        audio_io.save_wav(wav, path, self.sample_rate)

    # --- wavernn vocoder utilities (reference `utils/audio_processor.py:
    # 282-335`) -------------------------------------------------------

    @staticmethod
    def mulaw_encode(wav: np.ndarray, qc: int) -> np.ndarray:
        """μ-law companding + quantization to ``2^qc`` levels."""
        mu = 2**qc - 1
        signal = np.sign(wav) * np.log1p(mu * np.abs(wav)) / np.log1p(mu)
        return np.floor((signal + 1) / 2 * mu + 0.5)

    @staticmethod
    def mulaw_decode(wav: np.ndarray, qc: int) -> np.ndarray:
        mu = 2**qc - 1
        return np.sign(wav) / mu * ((1 + mu) ** np.abs(wav) - 1)

    @staticmethod
    def encode_16bits(x: np.ndarray) -> np.ndarray:
        return np.clip(x * 2**15, -(2**15), 2**15 - 1).astype(np.int16)

    @staticmethod
    def quantize(x: np.ndarray, bits: int) -> np.ndarray:
        return (x + 1.0) * (2**bits - 1) / 2

    @staticmethod
    def dequantize(x: np.ndarray, bits: int) -> np.ndarray:
        return 2 * x / (2**bits - 1) - 1

    def find_endpoint(
        self, wav: np.ndarray, threshold_db: float = -40.0, min_silence_sec: float = 0.8
    ) -> int:
        """First index after which the signal stays below `threshold_db`."""
        window = int(self.sample_rate * min_silence_sec)
        hop = max(1, window // 4)
        threshold = float(np.asarray(db_to_amp(jnp.asarray(threshold_db))))
        for x in range(hop, max(hop + 1, len(wav) - window), hop):
            if np.max(np.abs(wav[x : x + window])) < threshold:
                return x + hop
        return len(wav)

    # ------------------------------------------------------------------

    def frames_for(self, n_samples: int) -> int:
        from voicesplit_tpu.dsp.stft import num_frames

        return num_frames(n_samples, self.n_fft, self.hop_length)


def make_audio_processor(config: Config, synthesis_window: str = "hann") -> AudioProcessor:
    """Build the processor selected by ``config.audio.backend``

    (the reference's `WrapperAudioProcessor`, `utils/audio_processor.py:19-31`).
    """
    return AudioProcessor(config.audio, synthesis_window=synthesis_window)
