"""Native C++ loader tests: builds the .so, checks batch equivalence with
the Python loader, resume state, and prefetch ordering."""

import numpy as np
import pytest

from voicesplit_tpu.config import Config
from voicesplit_tpu.data import BatchIterator, SeparationDataset, build_synthetic_dataset, discover_samples
from voicesplit_tpu.data.native_loader import (
    NativeBatchIterator,
    make_train_iterator,
    native_loader_available,
)
from voicesplit_tpu.dsp.processor import AudioProcessor

SR = 16000

pytestmark = pytest.mark.skipif(
    not native_loader_available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("native"))
    build_synthetic_dataset(d, 10, SR, 1.0, seed=3)
    c = Config()
    ap = AudioProcessor(c.audio)
    return SeparationDataset(discover_samples(d, c.dataset.format), ap, 1.0)


def test_native_matches_python_loader(ds):
    py = BatchIterator(ds, 2, seed=11)
    nat = NativeBatchIterator(ds, 2, seed=11)
    for _ in range(6):  # spans an epoch boundary
        a, b = next(py), next(nat)
        np.testing.assert_allclose(b["emb"], a["emb"], atol=1e-6)
        np.testing.assert_allclose(b["mixed_wav"], a["mixed_wav"], atol=2e-7)
        np.testing.assert_allclose(b["target_wav"], a["target_wav"], atol=2e-7)
        np.testing.assert_array_equal(b["wav_len"], a["wav_len"])
        np.testing.assert_array_equal(b["seq_len"], a["seq_len"])


def test_native_resume_state(ds):
    it = NativeBatchIterator(ds, 2, seed=5)
    next(it)
    next(it)
    saved = it.state
    expected = [next(it)["mixed_wav"], next(it)["mixed_wav"]]
    it2 = NativeBatchIterator(ds, 2, seed=5)
    it2.load_state(saved)
    np.testing.assert_allclose(next(it2)["mixed_wav"], expected[0], atol=1e-7)
    np.testing.assert_allclose(next(it2)["mixed_wav"], expected[1], atol=1e-7)


def test_native_sharded(ds):
    a = NativeBatchIterator(ds, 1, seed=2, shard_id=0, num_shards=2)
    b = NativeBatchIterator(ds, 1, seed=2, shard_id=1, num_shards=2)
    wa = np.stack([next(a)["mixed_wav"][0] for _ in range(a.batches_per_epoch())])
    wb = np.stack([next(b)["mixed_wav"][0] for _ in range(b.batches_per_epoch())])
    assert not any((wa[i] == wb[j]).all() for i in range(len(wa)) for j in range(len(wb)))


def test_factory_prefers_native(ds):
    it = make_train_iterator(ds, 2)
    assert isinstance(it, NativeBatchIterator)
    it2 = make_train_iterator(ds, 2, prefer_native=False)
    assert isinstance(it2, BatchIterator)


def test_native_errors_on_wrong_sample_rate(ds, tmp_path):
    """Data errors must be loud: a wav at the wrong rate raises instead of
    silently feeding mis-cropped audio (the loader does not resample)."""
    import shutil

    from voicesplit_tpu.dsp.audio_io import save_wav

    d = str(tmp_path / "bad")
    shutil.copytree(ds.samples[0].target_wav.rsplit("/", 1)[0], d)
    c = Config()
    ap = AudioProcessor(c.audio)
    bad = SeparationDataset(discover_samples(d, c.dataset.format), ap, 1.0)
    # rewrite one wav at 22.05 kHz
    save_wav(np.zeros(22050, np.float32), bad.samples[0].mixed_wav, 22050)
    it = NativeBatchIterator(bad, 2, shuffle=False, seed=0)
    with pytest.raises(RuntimeError, match="sample rate"):
        for _ in range(it.batches_per_epoch()):
            next(it)


def test_native_errors_on_corrupt_embedding(ds, tmp_path):
    import shutil

    d = str(tmp_path / "bademb")
    shutil.copytree(ds.samples[0].target_wav.rsplit("/", 1)[0], d)
    c = Config()
    ap = AudioProcessor(c.audio)
    bad = SeparationDataset(discover_samples(d, c.dataset.format), ap, 1.0)
    with open(bad.samples[0].emb, "wb") as f:
        f.write(b"not an npy file")
    it = NativeBatchIterator(bad, 2, shuffle=False, seed=0)
    with pytest.raises(RuntimeError, match="embedding"):
        for _ in range(it.batches_per_epoch()):
            next(it)


def test_native_reads_pt_embeddings(ds, tmp_path):
    """Reference-format datasets ship torch *-emb.pt d-vectors; the native
    path must feed their true values (converted to cached .npy), never
    silent zeros."""
    torch = pytest.importorskip("torch")
    import shutil

    d = str(tmp_path / "ptemb")
    shutil.copytree(ds.samples[0].target_wav.rsplit("/", 1)[0], d)
    c = Config()
    ap = AudioProcessor(c.audio)
    tmp_ds = SeparationDataset(discover_samples(d, c.dataset.format), ap, 1.0)
    rng = np.random.default_rng(0)
    want = {}
    for s in tmp_ds.samples:
        vec = rng.standard_normal(256).astype(np.float32)
        pt_path = s.emb.rsplit(".", 1)[0] + ".pt"
        torch.save(torch.from_numpy(vec), pt_path)
        import os

        os.remove(s.emb)
        want[pt_path] = vec
    bad = SeparationDataset(discover_samples(d, c.dataset.format), ap, 1.0)
    assert all(s.emb.endswith(".pt") for s in bad.samples)
    it = NativeBatchIterator(bad, 2, shuffle=False, seed=0)
    batch = next(it)
    assert np.abs(batch["emb"]).sum() > 0
    np.testing.assert_allclose(batch["emb"][0], want[bad.samples[0].emb], atol=1e-6)
