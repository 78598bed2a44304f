"""Speech2Phone encoder: MFCC frontend, CReLU FC, importer, protocol.

Reference: `notebooks/Speech2Phone-ExtractSpeakerEmbeddings.ipynb`
(tflearn graph in cell 7, extraction loop in cell 12, silence trim in
cell 6) — MFCC [13, 216] of 5 s @ 22.05 kHz → FC(40) → CReLU → 80-d.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.models.speech2phone import (
    EMB_DIM,
    N_FRAMES,
    N_MFCC,
    SAMPLE_RATE,
    Speech2PhoneEncoder,
    crelu,
    librosa_mfcc,
    load_speech2phone_weights,
    speech2phone_embedding,
    trim_silence_dbfs,
)


def _speech_like(n, seed=0, sr=SAMPLE_RATE):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in zip(
            rng.uniform(0.1, 0.5, 6),
            rng.uniform(120, 3000, 6),
            rng.uniform(0, 6.28, 6),
        )
    )
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


# -- MFCC frontend ----------------------------------------------------------


def test_mfcc_shape_5s_is_13x216():
    wav = _speech_like(5 * SAMPLE_RATE)
    m = librosa_mfcc(wav)
    assert m.shape == (N_MFCC, N_FRAMES)
    assert np.isfinite(m).all()


def test_mfcc_first_coeff_is_orthonormal_mel_sum():
    """Ortho DCT-II coefficient 0 is sum(logmel) / sqrt(n_mels)."""
    from scipy.fft import dct

    rng = np.random.default_rng(1)
    logmel = rng.standard_normal((4, 128))
    c = dct(logmel, type=2, axis=-1, norm="ortho")
    np.testing.assert_allclose(
        c[:, 0], logmel.sum(axis=-1) / np.sqrt(128), rtol=1e-12
    )


def test_mfcc_gain_shifts_only_c0():
    """x -> 10x adds a constant 20 dB to every mel band, which an
    orthonormal DCT routes entirely into coefficient 0 (shift of
    20·sqrt(n_mels)) — higher coefficients are gain-invariant.  Uses a
    loud broadband signal so neither amin nor the 80 dB floor bites."""
    wav = _speech_like(2 * SAMPLE_RATE)
    m1 = librosa_mfcc(wav)
    m2 = librosa_mfcc(10.0 * wav)
    np.testing.assert_allclose(
        m2[0] - m1[0], np.full(m1.shape[1], 20.0 * np.sqrt(128)), atol=1e-2
    )
    np.testing.assert_allclose(m2[1:], m1[1:], atol=1e-3)


def test_mfcc_tone_energy_in_right_mel_region():
    """A pure 1 kHz tone's log-mel must peak in the 1 kHz band; check via
    the inverse DCT of the full coefficient set."""
    from scipy.fft import dct, idct

    from voicesplit_tpu.dsp.mel import mel_filterbank

    sr, n_fft = SAMPLE_RATE, 2048
    t = np.arange(3 * sr) / sr
    wav = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    # full-resolution mfcc (all 128 coeffs) -> invert to logmel
    pad = n_fft // 2
    w = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (w.size - n_fft) // 512
    idx = np.arange(n_fft)[None, :] + 512 * np.arange(n_frames)[:, None]
    frames = w[idx] * np.hanning(n_fft + 1)[:-1]
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    fb = mel_filterbank(sr, n_fft, 128)
    ref_logmel = 10 * np.log10(np.maximum(power @ fb.T, 1e-10))
    ref_logmel = np.maximum(ref_logmel, ref_logmel.max() - 80.0)
    got = dct(ref_logmel, type=2, axis=-1, norm="ortho")[:, :N_MFCC].T
    np.testing.assert_allclose(librosa_mfcc(wav), got, atol=1e-3)
    band = np.argmax(ref_logmel.mean(axis=0))
    from voicesplit_tpu.dsp.mel import _hz_to_mel, _mel_to_hz

    mel_pts = np.linspace(0.0, _hz_to_mel(np.array(sr / 2)), 130)
    center_hz = float(_mel_to_hz(mel_pts[band + 1]))
    assert abs(center_hz - 1000.0) < 150.0


# -- module + importer ------------------------------------------------------


def test_crelu_doubles_features():
    x = jnp.asarray([[1.0, -2.0, 0.0]])
    out = np.asarray(crelu(x))
    np.testing.assert_allclose(out, [[1.0, 0.0, 0.0, 0.0, 2.0, 0.0]])


def test_encoder_matches_hand_computed_fc():
    rng = np.random.default_rng(3)
    W = rng.standard_normal((N_MFCC * N_FRAMES, 40)).astype(np.float32) * 0.01
    b = rng.standard_normal(40).astype(np.float32)
    variables = load_speech2phone_weights({"FullyConnected/W:0": W,
                                           "FullyConnected/b:0": b})
    enc = Speech2PhoneEncoder()
    mfcc = rng.standard_normal((2, N_MFCC, N_FRAMES)).astype(np.float32)
    out = np.asarray(enc.apply(variables, jnp.asarray(mfcc)))
    # tflearn flattens row-major: index = row * 216 + frame
    pre = mfcc.reshape(2, -1) @ W + b
    ref = np.concatenate([np.maximum(pre, 0), np.maximum(-pre, 0)], axis=-1)
    assert out.shape == (2, EMB_DIM)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_importer_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    W = rng.standard_normal((N_MFCC * N_FRAMES, 40)).astype(np.float32)
    b = rng.standard_normal(40).astype(np.float32)
    p = str(tmp_path / "s2p.npz")
    np.savez(p, **{"FullyConnected/W": W, "FullyConnected/b": b})
    v = load_speech2phone_weights(p)
    np.testing.assert_array_equal(np.asarray(v["params"]["fc"]["kernel"]), W)
    np.testing.assert_array_equal(np.asarray(v["params"]["fc"]["bias"]), b)


def test_importer_torch_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    W = rng.standard_normal((N_MFCC * N_FRAMES, 40)).astype(np.float32)
    b = rng.standard_normal(40).astype(np.float32)
    p = str(tmp_path / "s2p.pt")
    torch.save({"W": torch.from_numpy(W), "b": torch.from_numpy(b)}, p)
    v = load_speech2phone_weights(p)
    np.testing.assert_array_equal(np.asarray(v["params"]["fc"]["kernel"]), W)


def test_importer_rejects_wrong_shapes():
    with pytest.raises(ValueError, match="expects W"):
        load_speech2phone_weights({"W": np.zeros((10, 40)), "b": np.zeros(40)})
    with pytest.raises(ValueError, match="not a Speech2Phone"):
        load_speech2phone_weights({"foo": np.zeros(3)})


# -- extraction protocol ----------------------------------------------------


def test_trim_silence_dbfs():
    sr = SAMPLE_RATE
    sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    wav = np.concatenate([np.zeros(sr // 2, np.float32), sig,
                          np.zeros(sr // 4, np.float32)])
    out = trim_silence_dbfs(wav, sr)
    # trimmed to the loud span, 10 ms chunk granularity
    assert abs(out.size - sig.size) <= 2 * sr // 100
    assert trim_silence_dbfs(np.zeros(sr, np.float32), sr).size == 0


def test_embedding_shape_and_short_clip_looping():
    rng = np.random.default_rng(9)
    enc = Speech2PhoneEncoder()
    variables = enc.init(jax.random.PRNGKey(0),
                         np.zeros((1, N_MFCC, N_FRAMES), np.float32))
    # 1.5 s clip at 16 kHz: must loop-concat to >5 s @ 22.05 kHz and embed
    wav = _speech_like(int(1.5 * 16000), seed=9, sr=16000)
    emb = speech2phone_embedding(enc, variables, wav, 16000)
    assert emb.shape == (EMB_DIM,)
    assert np.isfinite(emb).all()
    # silent input -> the [0] sentinel the dataset layer filters
    emb0 = speech2phone_embedding(enc, variables,
                                  np.zeros(16000, np.float32), 16000)
    np.testing.assert_array_equal(emb0, np.array([0], np.float32))


def test_embedding_is_mean_over_windows():
    enc = Speech2PhoneEncoder()
    variables = enc.init(jax.random.PRNGKey(1),
                         np.zeros((1, N_MFCC, N_FRAMES), np.float32))
    wav = _speech_like(7 * SAMPLE_RATE, seed=11)  # 7 s -> windows at 0,1,2 s
    emb = speech2phone_embedding(enc, variables, wav, SAMPLE_RATE)
    wav_t = trim_silence_dbfs(wav, SAMPLE_RATE)
    seg = 5 * SAMPLE_RATE
    dur = int(wav_t.size / SAMPLE_RATE)
    wins = [
        librosa_mfcc(wav_t[s * SAMPLE_RATE: s * SAMPLE_RATE + seg])[:, :N_FRAMES]
        for s in range(0, dur - 5 + 1)
    ]
    ref = np.mean(
        [np.asarray(enc.apply(variables, w[None])) for w in wins], axis=0
    )[0]
    np.testing.assert_allclose(emb, ref, atol=2e-4)  # values are O(40) fp32


def test_cli_speech2phone(tmp_path):
    from voicesplit_tpu.cli.extract_embeddings import main as cli_main
    from voicesplit_tpu.dsp.audio_io import save_wav

    rng = np.random.default_rng(13)
    W = (rng.standard_normal((N_MFCC * N_FRAMES, 40)) * 0.01).astype(np.float32)
    b = np.zeros(40, np.float32)
    ckpt = str(tmp_path / "s2p.npz")
    np.savez(ckpt, **{"FullyConnected/W": W, "FullyConnected/b": b})
    for i in range(2):
        save_wav(_speech_like(4 * 16000, seed=20 + i, sr=16000),
                 str(tmp_path / f"u{i}-ref_emb.wav"), 16000)
    cli_main(["--data_dir", str(tmp_path), "--encoder", "speech2phone",
              "--encoder_checkpoint", ckpt])
    for i in range(2):
        emb = np.load(str(tmp_path / f"u{i}-emb.npy"))
        assert emb.shape == (EMB_DIM,)
        assert np.isfinite(emb).all()
