"""Chunked low-latency streaming separation (BASELINE config 5).

The reference is strictly offline (fixed 3 s clips, BiLSTM).  This engine
introduces streaming the TPU way: one jitted, fixed-shape `chunk_step`
that carries all state explicitly —

- **STFT**: an input sample tail of ``n_fft − hop`` provides the frame
  overlap; each chunk computes exactly ``C`` new frames (no center
  padding mid-stream).
- **Conv stack**: non-causal with ±`conv_context` (65) frames of
  receptive field, so features are computed over a sliding window of
  ``2·ctx + C`` spectrogram frames kept in the state; emitted frames lag
  input by `ctx` frames (the lookahead).
- **LSTM**: the streaming MaskNet's unidirectional carry ``(h, c)``
  threads through chunks — bit-exact with a full-sequence pass
  (`tests/test_models.py::test_unilstm_carry_streaming_equivalence`).
- **iSTFT**: weighted overlap-add with an ``n_fft − hop`` carry buffer;
  interior samples are normalized by the hop-periodic steady-state
  window-sumsquare envelope.

Algorithmic latency = ``ctx_right·hop + (n_fft − hop)`` samples:

- default (symmetric convs): 65·160 + 1040 = 11440 ≈ **715 ms**,
  dominated by the conv lookahead;
- ``model.causal = true`` (causal conv stack, `(2e, 0)` time padding):
  the lookahead is zero, leaving only the STFT overlap — 1040 ≈
  **65 ms**.  Train with the flag on so weights match the causal
  geometry.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.normalize import amp_to_db, db_to_amp, denormalize_db, normalize_db
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.dsp.stft import istft_basis, overlap_add, stft_basis
from voicesplit_tpu.dsp.windows import get_window, pad_center
from voicesplit_tpu.models.masknet import MaskNet, make_masknet


@flax.struct.dataclass
class StreamState:
    sample_tail: jnp.ndarray  # [B, n_fft - hop] input overlap
    spec_hist: jnp.ndarray  # [B, 2*ctx, F] normalized spec history
    phase_hist: jnp.ndarray  # [B, 2*ctx, F]
    lstm_h: jnp.ndarray  # [B, H]
    lstm_c: jnp.ndarray  # [B, H]
    ola_tail: jnp.ndarray  # [B, n_fft - hop] output overlap-add carry


def _steady_envelope(n_fft: int, hop: int, win_length: int, window: str) -> np.ndarray:
    """Hop-periodic interior window-sumsquare: env[i] = Σ_k w²[i + k·hop]."""
    w2 = pad_center(get_window(window, win_length), n_fft) ** 2
    env = np.zeros(hop, np.float64)
    for i in range(hop):
        env[i] = w2[i::hop].sum()
    return np.maximum(env, 1e-10).astype(np.float32)


class StreamingSeparator:
    """Fixed-chunk streaming inference over a streaming `MaskNet`.

    `variables` must come from a `make_masknet(config, streaming=True)`
    model (unidirectional LSTM).  `chunk_frames` sets the block size:
    larger chunks → better MXU utilization, more buffering latency.
    """

    def __init__(
        self,
        config: Config,
        variables,
        chunk_frames: int = 50,
        synthesis_window: str = "hann",
    ):
        if config.audio.backend != "voicefilter":
            # The chunk step inlines the voicefilter backend's dB
            # normalize/denormalize; feeding a wavernn/waveglow-trained
            # model differently-scaled specs would silently produce
            # garbage, so refuse instead.
            raise NotImplementedError(
                "StreamingSeparator supports the 'voicefilter' audio backend "
                f"only (got {config.audio.backend!r})"
            )
        self.config = config
        self.model: MaskNet = make_masknet(config, streaming=True)
        self.variables = variables
        self.ap = AudioProcessor(config.audio, synthesis_window=synthesis_window)
        p = self.ap
        self.n_fft, self.hop, self.win = p.n_fft, p.hop_length, p.win_length
        self.F = p.num_freq
        self.C = chunk_frames
        # asymmetric conv context: (left, right) frames each emitted
        # frame needs; right == 0 for a causal model (`model.causal`),
        # which removes the conv lookahead from the latency entirely
        self.ctx_left = self.model.conv_context_left
        self.ctx_right = self.model.conv_context_right
        self.ctx = self.model.conv_context  # kept for introspection
        self.hist_frames = self.ctx_left + self.ctx_right
        self.chunk_samples = self.C * self.hop
        self.latency_samples = self.ctx_right * self.hop + (self.n_fft - self.hop)

        self._fwd_cos, self._fwd_sin = stft_basis(self.n_fft, self.win, "hann")
        self._inv_cos, self._inv_sin = istft_basis(self.n_fft, self.win, synthesis_window)
        self._env = np.tile(
            _steady_envelope(self.n_fft, self.hop, self.win, synthesis_window), self.C
        )
        self._chunk_step = jax.jit(self._chunk_step_impl)

    # ------------------------------------------------------------------

    def init_state(self, batch_size: int) -> StreamState:
        B, H = batch_size, self.config.model.lstm_dim
        z = lambda *s: jnp.zeros(s, jnp.float32)
        return StreamState(
            sample_tail=z(B, self.n_fft - self.hop),
            spec_hist=z(B, self.hist_frames, self.F),
            phase_hist=z(B, self.hist_frames, self.F),
            lstm_h=z(B, H),
            lstm_c=z(B, H),
            ola_tail=z(B, self.n_fft - self.hop),
        )

    def _chunk_step_impl(
        self, state: StreamState, samples: jnp.ndarray, emb: jnp.ndarray
    ) -> Tuple[StreamState, jnp.ndarray]:
        """``samples [B, C*hop]`` in → ``[B, C*hop]`` separated out (delayed)."""
        B = samples.shape[0]
        C, ctx, hop, n_fft = self.C, self.ctx_left, self.hop, self.n_fft

        # --- STFT of the C new frames ---------------------------------
        buf = jnp.concatenate([state.sample_tail, samples], axis=-1)
        idx = (np.arange(C) * hop)[:, None] + np.arange(n_fft)[None, :]
        frames = buf[:, idx]  # [B, C, n_fft]
        re = jnp.matmul(frames, self._fwd_cos, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, self._fwd_sin, precision=jax.lax.Precision.HIGHEST)
        mag = jnp.sqrt(re * re + im * im + 1e-30)
        phase_new = jnp.arctan2(im, re)
        spec_new = normalize_db(amp_to_db(mag) - self.ap.ref_level_db, self.ap.min_level_db)

        # --- conv features over the sliding window --------------------
        window = jnp.concatenate([state.spec_hist, spec_new], axis=1)  # [B, 2ctx+C, F]
        feats = self.model.apply(
            self.variables, window, method=self.model.conv_features
        )[:, ctx : ctx + C]  # the C frames lagging input by ctx

        # --- LSTM head with carry --------------------------------------
        mask, (h, c) = self.model.apply(
            self.variables, feats, emb,
            lstm_carry=(state.lstm_h, state.lstm_c),
            method=self.model.mask_head,
        )

        # spec/phase of the emitted (lagged) frames
        spec_out = window[:, ctx : ctx + C]
        phase_out = jnp.concatenate([state.phase_hist, phase_new], axis=1)[:, ctx : ctx + C]
        est = mask * spec_out

        # --- iSTFT with OLA carry --------------------------------------
        S = db_to_amp(denormalize_db(est, self.ap.min_level_db) + self.ap.ref_level_db)
        re_o = S * jnp.cos(phase_out)
        im_o = S * jnp.sin(phase_out)
        out_frames = (
            jnp.matmul(re_o, self._inv_cos, precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(im_o, self._inv_sin, precision=jax.lax.Precision.HIGHEST)
        )  # [B, C, n_fft]
        ola = overlap_add(out_frames, hop)  # [B, C*hop + (n_fft - hop)]
        ola = ola.at[:, : n_fft - hop].add(state.ola_tail)
        emitted = ola[:, : C * hop] / jnp.asarray(self._env)

        # The carry MUST keep the float32 signature of init_state: the
        # model returns (h, c) in its compute dtype (bf16 on TPU), and a
        # dtype flip in the threaded state forces a full recompile on the
        # second chunk (measured: 32 s compile + slow steady state).
        # float32 carry also avoids bf16 drift over long streams.
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
        new_state = StreamState(
            sample_tail=f32(buf[:, -(n_fft - hop):]),
            spec_hist=f32(window[:, C:]),
            phase_hist=f32(jnp.concatenate([state.phase_hist, phase_new], axis=1)[:, C:]),
            lstm_h=f32(h),
            lstm_c=f32(c),
            ola_tail=f32(ola[:, C * hop :]),
        )
        return new_state, emitted

    def process_chunk(self, state: StreamState, samples, emb):
        """One streaming step; `samples` must be ``[B, chunk_samples]``."""
        samples = jnp.asarray(samples, jnp.float32)
        if samples.shape[-1] != self.chunk_samples:
            raise ValueError(
                f"chunk must be {self.chunk_samples} samples, got {samples.shape[-1]}"
            )
        return self._chunk_step(state, samples, jnp.asarray(emb, jnp.float32))

    def separate(self, wav: np.ndarray, emb: np.ndarray) -> np.ndarray:
        """Convenience: stream a whole ``[B, L]`` signal chunk by chunk,
        compensating the pipeline latency; output aligned to input."""
        wav = np.atleast_2d(np.asarray(wav, np.float32))
        B, L = wav.shape
        cs = self.chunk_samples
        pad = (-L) % cs + self.latency_samples + cs
        padded = np.concatenate([wav, np.zeros((B, pad), np.float32)], axis=-1)
        state = self.init_state(B)
        outs = []
        for i in range(padded.shape[-1] // cs):
            state, out = self.process_chunk(state, padded[:, i * cs : (i + 1) * cs], emb)
            outs.append(np.asarray(out))
        full = np.concatenate(outs, axis=-1)
        return full[:, self.latency_samples : self.latency_samples + L]
