"""On-the-fly mixing iterator tests: determinism, resume, sharding,
epoch freshness."""

import os

import numpy as np
import pytest

from voicesplit_tpu.data.online import OnlineMixIterator, discover_utterances
from voicesplit_tpu.dsp.audio_io import save_wav_float

SR = 16000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("spk")
    rng = np.random.default_rng(0)
    for s in range(4):
        d = root / f"spk{s}"
        d.mkdir()
        f0 = 120 + 60 * s
        for k in range(3):
            t = np.arange(SR * 4) / SR
            wav = (0.2 * np.sin(2 * np.pi * f0 * t + k)).astype(np.float32)
            save_wav_float(wav, str(d / f"utt{k}.wav"), SR)
    return str(root)


def test_discover(corpus):
    spk = discover_utterances(corpus)
    assert len(spk) == 4
    assert all(len(v) == 3 for v in spk.values())


def test_discover_min_duration(corpus, tmp_path):
    # corpus fixture wavs are 4 s sine (no silence): a 3 s floor keeps all,
    # a 5 s floor rejects everything
    assert len(discover_utterances(corpus, min_duration=3.0)) == 4
    assert len(discover_utterances(corpus, min_duration=5.0)) == 0
    # a short utterance is dropped per-file, not per-speaker
    import shutil

    root = tmp_path / "mixed_len"
    shutil.copytree(corpus, root)
    short = (0.1 * np.sin(2 * np.pi * 200 * np.arange(SR) / SR)).astype(np.float32)
    save_wav_float(short, str(root / "spk0" / "short.wav"), SR)
    spk = discover_utterances(str(root), min_duration=3.0)
    assert len(spk["spk0"]) == 3  # the 1 s clip was filtered out


def test_batches_and_shapes(corpus):
    it = OnlineMixIterator(discover_utterances(corpus), batch_size=2, audio_len=2.0)
    b = next(it)
    assert b["mixed_wav"].shape == (2, SR * 2)
    assert b["emb"].shape == (2, 256)
    assert (b["wav_len"] == SR * 2).all()
    # mixture actually contains two sources
    assert not np.allclose(b["mixed_wav"], b["target_wav"])


def test_determinism_and_resume(corpus):
    spk = discover_utterances(corpus)
    a = OnlineMixIterator(spk, 2, audio_len=2.0, seed=7)
    stream = [next(a) for _ in range(4)]
    b = OnlineMixIterator(spk, 2, audio_len=2.0, seed=7)
    next(b)
    next(b)
    saved = b.state
    c = OnlineMixIterator(spk, 2, audio_len=2.0, seed=7)
    c.load_state(saved)
    np.testing.assert_array_equal(next(c)["mixed_wav"], stream[2]["mixed_wav"])
    np.testing.assert_array_equal(next(c)["mixed_wav"], stream[3]["mixed_wav"])


def test_epochs_differ(corpus):
    spk = discover_utterances(corpus)
    it = OnlineMixIterator(spk, 2, audio_len=2.0, seed=1, items_per_epoch=4)
    e0 = next(it)
    next(it)  # finish epoch 0
    e1 = next(it)  # epoch 1
    assert it.state.epoch == 1
    assert not np.array_equal(e0["mixed_wav"], e1["mixed_wav"])


def test_sharding_disjoint(corpus):
    spk = discover_utterances(corpus)
    a = OnlineMixIterator(spk, 2, audio_len=2.0, seed=3, shard_id=0, num_shards=2)
    b = OnlineMixIterator(spk, 2, audio_len=2.0, seed=3, shard_id=1, num_shards=2)
    wa = next(a)["mixed_wav"]
    wb = next(b)["mixed_wav"]
    assert not np.array_equal(wa, wb)


def test_pseudo_embeddings_stable(corpus):
    spk = discover_utterances(corpus)
    a = OnlineMixIterator(spk, 2, audio_len=2.0, seed=5)
    b = OnlineMixIterator(spk, 2, audio_len=2.0, seed=5)
    np.testing.assert_array_equal(next(a)["emb"], next(b)["emb"])


def test_spectral_emb_mode(corpus):
    spk = discover_utterances(corpus)
    it = OnlineMixIterator(spk, batch_size=4, sample_rate=SR, seed=5,
                           emb_mode="spectral")
    b = next(it)
    assert b["emb"].shape == (4, 256)
    np.testing.assert_allclose(np.linalg.norm(b["emb"], axis=-1), 1.0, atol=1e-5)
    # deterministic across a fresh iterator
    it2 = OnlineMixIterator(spk, batch_size=4, sample_rate=SR, seed=5,
                            emb_mode="spectral")
    np.testing.assert_array_equal(b["emb"], next(it2)["emb"])
    # explicit embeddings still take precedence over the spectral fallback
    fixed = {s: np.full(256, 0.0625, np.float32) for s in spk}
    it3 = OnlineMixIterator(spk, batch_size=4, sample_rate=SR, seed=5,
                            emb_mode="spectral", embeddings=fixed)
    np.testing.assert_array_equal(next(it3)["emb"][0], fixed["spk0"])
    with pytest.raises(ValueError):
        OnlineMixIterator(spk, batch_size=4, emb_mode="nope")


def test_spectral_dvector_geometry():
    """Same-timbre utterances cluster; different timbres separate —
    the property that makes open-set conditioning meaningful."""
    from voicesplit_tpu.models.speaker_encoder import spectral_dvector

    def shaped_noise(center_hz, seed):
        r = np.random.default_rng(seed)
        x = r.standard_normal(SR * 3)
        X = np.fft.rfft(x)
        f = np.linspace(0, SR / 2, X.size)
        X *= np.exp(-(((f - center_hz) / 600.0) ** 2))
        return np.fft.irfft(X, SR * 3).astype(np.float32)

    a1 = spectral_dvector(shaped_noise(500, 1), SR)
    a2 = spectral_dvector(shaped_noise(500, 2), SR)
    b1 = spectral_dvector(shaped_noise(2000, 3), SR)
    assert a1.shape == (256,) and a1.dtype == np.float32
    assert abs(np.linalg.norm(a1) - 1.0) < 1e-5
    same, cross = float(a1 @ a2), float(a1 @ b1)
    assert same > 0.6                    # same timbre, different noise draw
    assert cross < 0.3                   # different timbre
    assert same > cross + 0.4            # separability margin
    # gain invariance of the envelope features
    g = spectral_dvector(10.0 * shaped_noise(500, 1), SR)
    assert float(a1 @ g) > 0.99


def test_same_base_pseudo_speakers_never_mixed(tmp_path):
    """"<spk>~p090"-style speed-perturbed pseudo-speakers must never be
    mixed against their own base voice (near-unseparable target)."""
    rng = np.random.default_rng(2)
    root = tmp_path / "sa"
    for name, f0 in (("a", 150), ("a~p090", 135), ("a~p110", 165), ("b", 240)):
        d = root / name
        d.mkdir(parents=True)
        for k in range(2):
            t = np.arange(SR * 4) / SR
            wav = (0.2 * np.sin(2 * np.pi * f0 * t + k)).astype(np.float32)
            save_wav_float(wav, str(d / f"utt{k}.wav"), SR)
    spk = discover_utterances(str(root))
    assert len(spk) == 4
    it = OnlineMixIterator(spk, 2, audio_len=2.0, seed=11, items_per_epoch=8)
    # with 3 same-base identities of 4 total, random pairs hit same-base
    # half the time; the redraw must keep every mixture cross-base, and
    # every batch must still assemble (no retry exhaustion)
    for _ in range(6):
        batch = next(it)
        assert batch["mixed_wav"].shape == (2, 2 * SR)
    for i in range(24):
        it._make_item(0, i)
        tgt, intf = it.last_pair
        assert tgt.split("~")[0] != intf.split("~")[0], (tgt, intf)


def test_enrollment_from_distinct_recording(tmp_path):
    """When a speaker has >=2 distinct recordings, the enrollment clip
    must come from a different one than the separation source (x.wav and
    x-norm.wav count as the SAME recording)."""
    root = tmp_path / "groups"
    rng = np.random.default_rng(0)
    for spk, files in (("s1", ["a.wav", "a-norm.wav", "b.wav"]),
                       ("s2", ["c.wav", "c-norm.wav"])):
        d = root / spk
        d.mkdir(parents=True)
        for k, name in enumerate(files):
            t = np.arange(SR * 4) / SR
            f0 = 150 if spk == "s1" else 260
            wav = (0.2 * np.sin(2 * np.pi * f0 * t + k)).astype(np.float32)
            save_wav_float(wav, str(d / name), SR)
    spk = discover_utterances(str(root))
    it = OnlineMixIterator(spk, 2, audio_len=2.0, seed=3)
    s1_utts = spk["s1"]
    base = lambda p: os.path.basename(p).replace("-norm", "")  # noqa: E731
    draws = [it._draw_clean_and_emb(s1_utts, np.random.default_rng(i))
             for i in range(50)]
    assert all(base(c) != base(e) for c, e in draws)
    # both orders occur (clean from 'a' with emb 'b' and vice versa)
    assert len({(base(c), base(e)) for c, e in draws}) == 2
    # single-recording speaker still works (falls back to raw/norm pair)
    c, e = it._draw_clean_and_emb(spk["s2"], np.random.default_rng(0))
    assert c != e
