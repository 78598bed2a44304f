"""Voice-identity augmentation ops (`dsp/augment.py`) + conditioning
noise (`data/online.py::emb_noise`).

These synthesize the speaker diversity the reference got from 2k+ real
LibriSpeech speakers (`Final Report.pdf` §2.4); the tests pin the
physical property each op claims: pitch_shift moves f0 at constant
length/tempo, vtlp moves formant structure at constant pitch, emb_noise
perturbs deterministically and renormalizes.
"""

import numpy as np
import pytest

from voicesplit_tpu.dsp.augment import pitch_shift, time_stretch, vtlp

SR = 16000


def _dominant_freq(wav, sr=SR):
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    return np.argmax(spec) * sr / len(wav)


def _sine(freq, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_time_stretch_changes_length_not_pitch():
    wav = _sine(440.0)
    for rate in (0.8, 1.25):
        out = time_stretch(wav, rate)
        assert out.shape[0] == int(round(wav.shape[0] / rate))
        f = _dominant_freq(out)
        assert abs(f - 440.0) < 15.0, (rate, f)


@pytest.mark.parametrize("semitones", [-2.0, 2.0, 4.0])
def test_pitch_shift_moves_f0_constant_length(semitones):
    wav = _sine(440.0)
    out = pitch_shift(wav, SR, semitones)
    assert out.shape == wav.shape  # constant tempo/duration
    expect = 440.0 * 2 ** (semitones / 12.0)
    f = _dominant_freq(out)
    assert abs(f - expect) < 0.03 * expect, (f, expect)


def test_vtlp_preserves_pitch_moves_formants():
    # fundamental at 200 Hz with a strong "formant" partial at 3 kHz:
    # VTLP must keep the f0 region in place but move the 3 kHz energy
    t = np.arange(SR) / SR
    wav = (0.5 * np.sin(2 * np.pi * 200 * t)
           + 0.3 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    for alpha in (0.9, 1.1):
        out = vtlp(wav, SR, alpha)
        assert out.shape == wav.shape
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        freqs = np.fft.rfftfreq(len(out), 1 / SR)
        # low region scales by alpha: f0 moves only slightly (200*alpha)
        lowpk = freqs[np.argmax(spec * (freqs < 500))]
        assert abs(lowpk - 200 * alpha) < 25, (alpha, lowpk)
        # the 3 kHz partial lands near 3000*alpha (within the linear zone)
        band = (freqs > 2000) & (freqs < 4500)
        hipk = freqs[np.argmax(np.where(band, spec, 0))]
        assert abs(hipk - 3000 * alpha) < 100, (alpha, hipk)


def test_vtlp_identity_alpha_is_near_noop():
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    out = vtlp(wav, SR, 1.0)
    # alpha=1 warp is the identity map; only STFT round-trip loss remains
    err = np.abs(out - wav)[256:-256]  # edges lose window coverage
    assert float(np.max(err)) < 1e-3


def test_emb_noise_deterministic_and_normalized():
    from voicesplit_tpu.data.online import OnlineMixIterator

    rng = np.random.default_rng(3)

    def corpus(tmp):
        import os

        from voicesplit_tpu.dsp.audio_io import save_wav

        speakers = {}
        for spk in ("a", "b", "c"):
            d = tmp / spk
            d.mkdir()
            paths = []
            for i in range(2):
                p = str(d / f"{spk}{i}.wav")
                save_wav(0.1 * rng.standard_normal(4 * SR).astype(np.float32), p, SR)
                paths.append(p)
            speakers[spk] = paths
        return speakers

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        speakers = corpus(Path(td))
        kw = dict(batch_size=2, sample_rate=SR, audio_len=1.0, seed=5,
                  items_per_epoch=4, emb_noise=0.2)
        it1 = OnlineMixIterator(speakers, **kw)
        it2 = OnlineMixIterator(speakers, **kw)
        b1, b2 = next(it1), next(it2)
        # deterministic: same seed -> same noised embeddings
        np.testing.assert_array_equal(b1["emb"], b2["emb"])
        # renormalized to unit length
        np.testing.assert_allclose(
            np.linalg.norm(b1["emb"], axis=-1), 1.0, atol=1e-5
        )
        # actually different from the clean embeddings
        clean = OnlineMixIterator(speakers, **{**kw, "emb_noise": 0.0})
        b0 = next(clean)
        assert float(np.max(np.abs(b0["emb"] - b1["emb"]))) > 1e-3


def test_encoder_grid_subset_filters_by_tag():
    # the suffix-tag scheme add_pseudo_speakers writes: p<speed*100>,
    # s<+semitones>, v<alpha*100>; base voices always survive
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from scripts.demo_train import encoder_grid_subset

    pool = {
        "84": ["a"], "84~p090": ["b"], "84~p110": ["c"],
        "84~s-2.0": ["d"], "84~s+4.0": ["e"],
        "84~v090": ["f"], "84~v115": ["g"],
    }
    kept = encoder_grid_subset(pool, "pitch:-2;vtlp:0.9;speed:0.9,1.1")
    assert set(kept) == {"84", "84~p090", "84~p110", "84~s-2.0", "84~v090"}
    # omitted axis drops that axis's pseudo-voices entirely
    assert set(encoder_grid_subset(pool, "speed:0.9")) == {"84", "84~p090"}
    # unknown axis is a hard error
    import pytest
    with pytest.raises(SystemExit):
        encoder_grid_subset(pool, "formant:1.0")
