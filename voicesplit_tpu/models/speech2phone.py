"""Speech2Phone speaker encoder — the reference's third embedding source.

The reference extracts 80-d speaker embeddings with the Speech2Phone
model in `notebooks/Speech2Phone-ExtractSpeakerEmbeddings.ipynb`
(tflearn/TF1): MFCC ``[13, 216]`` of a 5 s / 22.05 kHz segment →
``fully_connected(40, activation='crelu')`` → the CReLU layer output is
the embedding (CReLU concatenates ``relu(x)`` and ``relu(-x)``, so the
"40-unit" layer emits **80** features — exactly the ``emb_dim 80`` note
in the reference `config.json:41`).  The two dropout layers in the
notebook graph are inference no-ops.

This module provides the TPU-native equivalents:

- `librosa_mfcc`      — the frontend (librosa-default MFCC: centered
                        2048-pt STFT hop 512, 128-band Slaney mel, dB
                        with an 80 dB floor, orthonormal DCT-II, 13
                        coefficients), host-side numpy/scipy.
- `Speech2PhoneEncoder` — the flax module (flatten → Dense(40) → CReLU).
- `load_speech2phone_weights` — weight importer.  The original
                        checkpoint is a TF1 tflearn saver bundle
                        (tensorflow is not a dependency here), so the
                        importer takes the standard interchange forms:
                        an ``.npz``/dict with ``FullyConnected/W``
                        ``[2808, 40]`` and ``FullyConnected/b`` ``[40]``
                        (export from tflearn with
                        ``model.get_weights(...)``), or a torch ``.pt``
                        holding the same two arrays.
- `speech2phone_embedding` — the notebook's extraction protocol:
                        leading/trailing silence trim (pydub ``dBFS >
                        -50`` over 10 ms chunks), loop-concatenate
                        short clips past 5 s, sliding 5 s windows at
                        1 s stride, embed each, mean over windows.

Reference citations: topology `Speech2Phone-ExtractSpeakerEmbeddings
.ipynb` cell 7; extraction loop cell 12; silence trim cell 6.
"""

from __future__ import annotations

from typing import Dict, Mapping, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 22050  # the notebook loads with librosa sr=22050 (cell 12)
N_MFCC = 13
N_FRAMES = 216  # 1 + (5*22050)//512 — fixed tflearn input shape [13, 216]
SEGMENT_SECONDS = 5
STEP_SECONDS = 1
HIDDEN = 40
EMB_DIM = 2 * HIDDEN  # CReLU doubles the feature count


def librosa_mfcc(
    wav: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_mfcc: int = N_MFCC,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
) -> np.ndarray:
    """librosa-default MFCC, ``[n_mfcc, T]``.

    Matches ``librosa.feature.mfcc(y, sr)`` conventions: centered STFT
    (reflect pad n_fft//2), hann window, power spectrogram, Slaney mel
    filterbank (htk=False, norm='slaney'), ``power_to_db`` with
    ``ref=1, amin=1e-10, top_db=80`` (floor relative to the max), then
    orthonormal DCT-II over the mel axis.  Host-side numpy/scipy — the
    embedding matmul is the device work, the frontend is ~100 kB.
    """
    from scipy.fft import dct

    from voicesplit_tpu.dsp.mel import mel_filterbank

    wav = np.asarray(wav, np.float32).reshape(-1)
    pad = n_fft // 2
    if wav.size < pad + 1:  # too short even to reflect-pad: zero-extend
        wav = np.concatenate([wav, np.zeros(pad + 1 - wav.size, np.float32)])
    wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (wav.size - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)  # periodic hann
    frames = wav[idx] * window[None, :]
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [T, F]
    fb = mel_filterbank(sample_rate, n_fft, n_mels)  # [n_mels, F] slaney
    mel = power @ fb.T  # [T, n_mels]
    logmel = 10.0 * np.log10(np.maximum(mel, 1e-10))
    logmel = np.maximum(logmel, logmel.max() - 80.0)  # top_db=80
    mfcc = dct(logmel, type=2, axis=-1, norm="ortho")[:, :n_mfcc]
    return mfcc.T.astype(np.float32)  # [n_mfcc, T]


def crelu(x: jnp.ndarray) -> jnp.ndarray:
    """``tf.nn.crelu``: concat(relu(x), relu(-x)) on the last axis."""
    return jnp.concatenate([jnp.maximum(x, 0.0), jnp.maximum(-x, 0.0)], axis=-1)


class Speech2PhoneEncoder(nn.Module):
    """MFCC ``[B, 13, 216]`` → 80-d embedding (CReLU of a 40-unit FC).

    Flatten order is tflearn's row-major reshape of the ``[13, 216]``
    input (coefficient-major: index = mfcc_row * 216 + frame), matching
    the ``FullyConnected/W [2808, 40]`` weight layout of the original
    checkpoint.
    """

    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, mfcc: jnp.ndarray) -> jnp.ndarray:
        B = mfcc.shape[0]
        x = mfcc.reshape(B, -1)  # row-major [13*216] — tflearn order
        x = nn.Dense(self.hidden, name="fc")(x)
        return crelu(x)


def load_speech2phone_weights(
    source: Union[str, Mapping[str, np.ndarray]],
) -> Dict:
    """Importer → `Speech2PhoneEncoder` variables.

    ``source`` is a path to ``.npz``/``.pt`` or an already-loaded
    mapping.  Keys are matched case-insensitively on (``w``/``weight``)
    and (``b``/``bias``) suffixes after stripping scope prefixes, so
    both tflearn's ``FullyConnected/W:0`` style and plain ``{"W": ...,
    "b": ...}`` exports work.  Validates the ``[2808, 40]`` / ``[40]``
    shapes of the published checkpoint.
    """
    if isinstance(source, str):
        if source.endswith(".npz") or source.endswith(".npy"):
            source = dict(np.load(source, allow_pickle=True))
            if len(source) == 1 and next(iter(source)).startswith("arr_"):
                # np.save of a dict → 0-d object array
                source = next(iter(source.values())).item()
        else:
            import torch

            payload = torch.load(source, map_location="cpu", weights_only=False)
            source = payload.get("model_state", payload)

    def norm(k: str) -> str:
        k = k.split("/")[-1].split(".")[-1]
        return k.split(":")[0].lower()

    arrays = {
        norm(k): (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in source.items()
    }
    w = arrays.get("w", arrays.get("weight", arrays.get("kernel")))
    b = arrays.get("b", arrays.get("bias"))
    if w is None or b is None:
        raise ValueError(
            f"no FullyConnected W/b pair in keys {sorted(arrays)} — not a "
            "Speech2Phone export"
        )
    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32).reshape(-1)
    if w.ndim != 2 or w.shape[0] != N_MFCC * N_FRAMES or w.shape[1] != b.size:
        raise ValueError(
            f"Speech2Phone FC expects W [{N_MFCC * N_FRAMES}, H] and b [H]; "
            f"got {w.shape} / {b.shape}"
        )
    return {"params": {"fc": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}}


def trim_silence_dbfs(
    wav: np.ndarray,
    sample_rate: int,
    threshold_dbfs: float = -50.0,
    chunk_ms: int = 10,
) -> np.ndarray:
    """pydub-style leading/trailing silence trim (notebook cell 6).

    pydub's ``dBFS`` is 20·log10(rms / full-scale); a 10 ms chunk louder
    than ``threshold_dbfs`` ends the scan from each side.  Returns an
    empty array when the whole clip is silent (the notebook skips those
    files)."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    n = max(1, int(sample_rate * chunk_ms / 1000))
    n_chunks = wav.size // n
    if n_chunks == 0:
        return wav.copy()
    rms = np.sqrt(
        np.mean(wav[: n_chunks * n].reshape(n_chunks, n) ** 2, axis=-1)
    )
    dbfs = 20.0 * np.log10(np.maximum(rms, 1e-12))
    loud = np.flatnonzero(dbfs > threshold_dbfs)
    if loud.size == 0:
        return wav[:0]
    start = loud[0] * n
    end = min(wav.size, (loud[-1] + 1) * n)
    return wav[start:end]


def speech2phone_embedding(
    encoder: Speech2PhoneEncoder,
    variables: Dict,
    wav: np.ndarray,
    sample_rate: int,
    apply_fn=None,
) -> np.ndarray:
    """The notebook's full extraction protocol → 80-d embedding.

    Trim silence; clips whose integer duration is < 5 s are extended by
    repeatedly appending the original clip until int(duration) > 5
    (cell 12: ``if int(wave.duration_seconds) < 5: ... while
    int(aux.duration_seconds) <= 5: aux += wave``); slide
    5 s windows at 1 s hops while the window end ≤ int(duration);
    MFCC + encode each; mean over windows.  Returns ``None``-equivalent
    (the ``[0]`` sentinel) for all-silent input, mirroring the dataset
    layer's sentinel convention.
    """
    from voicesplit_tpu.dsp.audio_io import resample

    wav = trim_silence_dbfs(np.asarray(wav, np.float32), sample_rate)
    if wav.size == 0:
        return np.array([0], np.float32)
    if sample_rate != SAMPLE_RATE:
        wav = resample(wav, sample_rate, SAMPLE_RATE)
    seg = SEGMENT_SECONDS * SAMPLE_RATE
    # Notebook cell 12: only clips with int(duration) < 5 are extended
    # (5.0-5.99 s clips embed from their single [0:5] window), and each
    # iteration appends the ORIGINAL clip (`aux += wave`, starting from
    # aux = wave), not a doubling of the running buffer.
    if int(wav.size / SAMPLE_RATE) < SEGMENT_SECONDS:
        aux = wav
        while int(aux.size / SAMPLE_RATE) <= SEGMENT_SECONDS:
            aux = np.concatenate([aux, wav])
        wav = aux
    dur_s = int(wav.size / SAMPLE_RATE)
    starts = range(0, dur_s - SEGMENT_SECONDS + 1, STEP_SECONDS)
    mfccs = np.stack(
        [
            librosa_mfcc(wav[s * SAMPLE_RATE : s * SAMPLE_RATE + seg])[:, :N_FRAMES]
            for s in starts
        ]
    )  # [n_win, 13, 216]
    fn = apply_fn if apply_fn is not None else (
        lambda m: encoder.apply(variables, m)
    )
    embs = np.asarray(fn(jnp.asarray(mfccs)))
    return embs.mean(axis=0).astype(np.float32)
