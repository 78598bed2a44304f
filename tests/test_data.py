"""Data pipeline tests: mixers, discovery, iterator determinism/state."""

import os

import numpy as np
import pytest

from voicesplit_tpu.config import Config, DatasetFormat
from voicesplit_tpu.data import (
    BatchIterator,
    SeparationDataset,
    build_synthetic_dataset,
    discover_samples,
    mix_overlap,
    mix_sequential,
)
from voicesplit_tpu.data.dataset import IteratorState
from voicesplit_tpu.dsp.audio_io import load_wav, save_wav_float, trim_silence
from voicesplit_tpu.dsp.processor import AudioProcessor

SR = 16000


def _voice(seed, n=60000, amp=0.2):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * rng.uniform(100, 300) * t)).astype(np.float32)


def test_mix_overlap_basic():
    s = mix_overlap(_voice(0), _voice(1), _voice(2), SR, 3.0)
    assert s is not None
    n = SR * 3
    assert s.target_wav.shape == (n,) and s.mixed_wav.shape == (n,)
    # normalized by 1.1*max|mixed| ⇒ peak slightly below 1/1.1
    assert np.isclose(np.abs(s.mixed_wav).max(), 1 / 1.1, atol=1e-3)


def test_mix_overlap_rejects_short():
    assert mix_overlap(_voice(0), _voice(1, n=8000), _voice(2), SR, 3.0) is None


def test_mix_overlap_trims_silence():
    clean = np.concatenate([np.zeros(SR, np.float32), _voice(1)])
    s = mix_overlap(_voice(0), clean, _voice(2), SR, 3.0)
    assert s is not None  # leading silence trimmed, still >= 3 s voiced


def test_trim_silence():
    y = np.concatenate([np.zeros(8000, np.float32), _voice(3, 16000), np.zeros(8000, np.float32)])
    trimmed, (start, end) = trim_silence(y, top_db=20)
    assert 6000 < start < 9000 and 23000 < end < 26000


def test_mix_sequential_variants():
    rng = np.random.default_rng(0)
    noise = (0.02 * rng.standard_normal(SR * 12)).astype(np.float32)
    out = mix_sequential(
        _voice(0, SR * 5), _voice(1, SR * 5), _voice(2, SR * 5),
        noise, noise.copy(), SR, rng,
    )
    variants = {s.variant for s in out}
    assert {"mixed", "identity", "zero_mask", "random_amp"} <= variants
    for s in out:
        assert s.mixed_wav.shape == s.target_wav.shape
        if s.variant == "zero_mask":
            assert np.abs(s.target_wav).max() == 0.0
        if s.variant == "identity":
            np.testing.assert_array_equal(s.mixed_wav, s.target_wav)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth"))
    paths = build_synthetic_dataset(d, 8, SR, 3.0, seed=0)
    assert len(paths) >= 6
    return d


def test_discovery_and_dataset(synth_dir):
    c = Config()
    samples = discover_samples(synth_dir, c.dataset.format)
    assert len(samples) >= 6
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(samples, ap, 3.0)
    item = ds[0]
    assert item["emb"].shape == (256,)
    assert item["mixed_wav"].shape == (48000,)
    assert item["target_wav"].shape == (48000,)
    assert int(item["wav_len"]) == 48000
    # target + interference == mixed up to normalization; at least non-equal
    assert not np.array_equal(item["mixed_wav"], item["target_wav"])


def test_sentinel_embeddings_dropped(tmp_path):
    fmt = DatasetFormat()
    d = str(tmp_path)
    for i, emb in enumerate([np.zeros(1), np.ones(256)]):
        np.save(os.path.join(d, f"{i:06d}-emb.npy"), emb.astype(np.float32))
        for pat in (fmt.target_wav, fmt.mixed_wav):
            save_wav_float(np.zeros(1000, np.float32), os.path.join(d, pat.replace("*", f"{i:06d}")), SR)
    samples = discover_samples(d, fmt)
    assert len(samples) == 1  # the scalar-[0] sentinel is gone


def test_reads_reference_pt_embeddings(tmp_path):
    import torch

    fmt = DatasetFormat(emb="*-emb.pt")
    d = str(tmp_path)
    torch.save(torch.ones(256), os.path.join(d, "000000-emb.pt"))
    for pat in (fmt.target_wav, fmt.mixed_wav):
        save_wav_float(np.zeros(1000, np.float32), os.path.join(d, pat.replace("*", "000000")), SR)
    samples = discover_samples(d, fmt)
    c = Config()
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(samples, ap, 3.0)
    assert ds[0]["emb"].shape == (256,)


def test_iterator_determinism_and_state(synth_dir):
    c = Config()
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(discover_samples(synth_dir, c.dataset.format), ap, 3.0)
    it1 = BatchIterator(ds, 2, seed=7)
    b1 = [next(it1) for _ in range(4)]
    # resume from captured state reproduces the stream
    it2 = BatchIterator(ds, 2, seed=7)
    next(it2)
    next(it2)
    saved = it2.state
    it3 = BatchIterator(ds, 2, seed=7)
    it3.load_state(saved)
    np.testing.assert_array_equal(next(it3)["emb"], b1[2]["emb"])
    np.testing.assert_array_equal(next(it3)["emb"], b1[3]["emb"])


def test_iterator_sharding(synth_dir):
    c = Config()
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(discover_samples(synth_dir, c.dataset.format), ap, 3.0)
    a = BatchIterator(ds, 1, seed=3, shard_id=0, num_shards=2)
    b = BatchIterator(ds, 1, seed=3, shard_id=1, num_shards=2)
    wa = np.stack([next(a)["mixed_wav"][0] for _ in range(a.batches_per_epoch())])
    wb = np.stack([next(b)["mixed_wav"][0] for _ in range(b.batches_per_epoch())])
    # different shards see disjoint items within the epoch
    assert not any((wa[i] == wb[j]).all() for i in range(len(wa)) for j in range(len(wb)))


def test_epoch_rollover(synth_dir):
    c = Config()
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(discover_samples(synth_dir, c.dataset.format), ap, 3.0)
    it = BatchIterator(ds, 2, seed=1)
    nb = it.batches_per_epoch()
    for _ in range(nb + 1):
        next(it)
    assert it.state.epoch == 1 and it.state.position == 1
