"""Eval tests: SDR metric properties, validation loop, checkpoint sweep."""

import numpy as np
import pytest

import jax

from voicesplit_tpu.config import Config
from voicesplit_tpu.data import BatchIterator, SeparationDataset, build_synthetic_dataset, discover_samples
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.eval import bss_eval_sdr, si_snr_improvement, sweep_checkpoints, validate
from voicesplit_tpu.eval.metrics import sdr_improvement
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)

SR = 16000


def _sig(seed, n=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (np.sin(2 * np.pi * rng.uniform(100, 400) * t) + 0.05 * rng.standard_normal(n)).astype(np.float64)


def test_sdr_perfect():
    s = _sig(0)
    assert bss_eval_sdr(s, s) > 80


def test_sdr_filtered_copy_is_high():
    """SDR projects onto 512-tap filters of the reference — a mildly
    filtered copy still scores very high (the point of bss_eval)."""
    import scipy.signal

    s = _sig(1)
    filtered = scipy.signal.lfilter([0.8, 0.15, -0.05], [1], s)
    assert bss_eval_sdr(s, filtered) > 40


def test_sdr_degrades_with_noise():
    s = _sig(2)
    n = np.random.default_rng(3).standard_normal(len(s))
    vals = [bss_eval_sdr(s, s + a * n) for a in (0.01, 0.1, 0.5)]
    assert vals[0] > vals[1] > vals[2]
    # ~known value: noise at -20 dB → SDR ≈ 20 dB (orthogonal-ish noise)
    power_ratio = 10 * np.log10(np.sum(s**2) / np.sum((0.1 * n) ** 2))
    assert abs(vals[1] - power_ratio) < 1.5


def test_si_snri_zero_for_mixture_estimate():
    s, i = _sig(4), _sig(5)
    mix = s + i
    assert abs(si_snr_improvement(mix, s, mix)) < 1e-6
    assert si_snr_improvement(s, s, mix) > 50


def test_sdri():
    s, i = _sig(6), _sig(7)
    mix = s + i
    assert sdr_improvement(s, s, mix) > 50


# ---------------------------------------------------------------------------
# batched on-device SDR / SI-SNRi vs the float64 host path
# ---------------------------------------------------------------------------


def test_sdr_batch_matches_host():
    from voicesplit_tpu.eval import bss_eval_sdr_batch

    rng = np.random.default_rng(10)
    N = 16000
    lens = np.array([N, N - 1234, N - 5000, N], np.int32)
    refs, ests = [], []
    for b, n in enumerate(lens):
        s = _sig(20 + b, N)
        noise = rng.standard_normal(N)
        y = s + [0.01, 0.05, 0.2, 0.5][b] * noise
        s[n:] = 0.0
        y[n:] = 0.0
        refs.append(s)
        ests.append(y)
    refs = np.stack(refs).astype(np.float32)
    ests = np.stack(ests).astype(np.float32)

    got = bss_eval_sdr_batch(refs, ests, lens)
    want = np.array(
        [bss_eval_sdr(refs[b, : lens[b]], ests[b, : lens[b]]) for b in range(len(lens))]
    )
    np.testing.assert_allclose(got, want, atol=0.01)


def test_sdr_batch_matches_host_on_real_speech():
    import os

    base = "/root/reference/datasets/LibriSpeech/audios_demo"
    if not os.path.isdir(base):
        pytest.skip("reference demo audios not mounted")
    import glob

    from voicesplit_tpu.dsp.audio_io import load_wav
    from voicesplit_tpu.eval import bss_eval_sdr_batch

    clean = sorted(glob.glob(os.path.join(base, "clean", "*.wav")))[:4]
    assert clean
    N = 3 * SR
    refs, ests, lens = [], [], []
    rng = np.random.default_rng(0)
    for i, path in enumerate(clean):
        wav = load_wav(path, SR)[:N]
        n = len(wav)
        s = np.zeros(N, np.float32)
        s[:n] = wav
        other = load_wav(clean[(i + 1) % len(clean)], SR)[:N]
        y = s.copy()
        y[: len(other)] += 0.3 * other  # interference → moderate SDR
        refs.append(s)
        ests.append(y)
        lens.append(n)
    refs, ests = np.stack(refs), np.stack(ests)
    lens = np.asarray(lens, np.int32)
    got = bss_eval_sdr_batch(refs, ests, lens)
    want = np.array(
        [bss_eval_sdr(refs[b, : lens[b]], ests[b, : lens[b]]) for b in range(len(lens))]
    )
    # fp32 residual noise floor caps resolvable SDR around ~75 dB; in the
    # range real separation results live in, the paths agree tightly.
    realistic = want < 40
    assert realistic.any()
    np.testing.assert_allclose(got[realistic], want[realistic], atol=0.01)
    assert (got[~realistic] > 40).all()


def test_sdr_batch_short_signal():
    """Signals shorter than the 512-tap filter must not crash (taps are
    capped at the sample count) and should still rank quality sensibly."""
    from voicesplit_tpu.eval import bss_eval_sdr_batch

    rng = np.random.default_rng(44)
    N = 400
    s = _sig(42, N).astype(np.float32)
    y1 = s + 0.05 * rng.standard_normal(N).astype(np.float32)
    y2 = s + 0.5 * rng.standard_normal(N).astype(np.float32)
    got = bss_eval_sdr_batch(np.stack([s, s]), np.stack([y1, y2]),
                             np.array([N, N], np.int32))
    assert np.isfinite(got).all()
    assert got[0] > got[1] > 0


def test_si_snri_batch_matches_host():
    from voicesplit_tpu.eval import si_snr_improvement_batch

    N = 16000
    lens = np.array([N, N - 777], np.int32)
    tgt = np.stack([_sig(30, N), _sig(31, N)]).astype(np.float32)
    intf = np.stack([_sig(32, N), _sig(33, N)]).astype(np.float32)
    for b, n in enumerate(lens):
        tgt[b, n:] = 0
        intf[b, n:] = 0
    mix = tgt + intf
    est = tgt + 0.1 * intf
    got = si_snr_improvement_batch(est, tgt, mix, lens)
    want = np.array(
        [
            si_snr_improvement(est[b, : lens[b]], tgt[b, : lens[b]], mix[b, : lens[b]])
            for b in range(len(lens))
        ]
    )
    np.testing.assert_allclose(got, want, atol=0.01)


# ---------------------------------------------------------------------------
# validation + sweep over a tiny run
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    c = Config()
    c.model_name = "voicefilter"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.6
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"

    data_dir = str(tmp_path_factory.mktemp("data"))
    build_synthetic_dataset(data_dir, 6, SR, c.audio.audio_len, seed=1)
    ap = AudioProcessor(c.audio)
    ds = SeparationDataset(discover_samples(data_dir, c.dataset.format), ap, c.audio.audio_len)
    loader = BatchIterator(ds, 2, shuffle=False)

    model = make_masknet(c)
    tx = make_optimizer(c)
    T, F = ds.n_frames, 601
    state = create_train_state(c, model, jax.random.PRNGKey(0), (2, T, F), tx)
    train_step = make_train_step(c, model, ap, tx, donate=False)
    eval_step = make_eval_step(c, model, ap)

    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    for _ in range(2):
        state, _ = train_step(state, next(loader))
        save_checkpoint(ckpt_dir, state, c)
    return c, ap, state, eval_step, loader, ckpt_dir


def test_validate(tiny_run):
    c, ap, state, eval_step, loader, _ = tiny_run
    m = validate(eval_step, state.params, state.batch_stats, loader, compute_sdr=True)
    assert np.isfinite(m["loss"]) and np.isfinite(m["si_snr"])
    assert "sdr" in m and "si_snri" in m


def test_validate_sdr_backends_agree(tiny_run):
    """Device-batched SDR/SI-SNRi ≡ host float64 path in validate()."""
    c, ap, state, eval_step, loader, _ = tiny_run
    host = validate(
        eval_step, state.params, state.batch_stats, loader,
        compute_sdr=True, sdr_backend="host",
    )
    dev = validate(
        eval_step, state.params, state.batch_stats, loader,
        compute_sdr=True, sdr_backend="device",
    )
    assert abs(host["sdr"] - dev["sdr"]) < 0.01
    assert abs(host["si_snri"] - dev["si_snri"]) < 0.01
    assert abs(host["loss"] - dev["loss"]) < 1e-6


def test_validate_counts_tail_items_and_max_items(tiny_run):
    """bs=4 over 6 items must score all 6 (padded final batch trimmed via
    n_valid) and agree with the bs=1 means; max_items counts items."""
    from voicesplit_tpu.data import BatchIterator

    c, ap, state, eval_step4, loader, _ = tiny_run
    ds = loader.dataset
    assert len(ds) == 6
    l1 = BatchIterator(ds, 1, shuffle=False, drop_last=False, pad_last=True)
    l4 = BatchIterator(ds, 4, shuffle=False, drop_last=False, pad_last=True)
    assert l4.batches_per_epoch() == 2
    m1 = validate(eval_step4, state.params, state.batch_stats, l1,
                  compute_sdr=True, sdr_backend="host", log_sample=False)
    m4 = validate(eval_step4, state.params, state.batch_stats, l4,
                  compute_sdr=True, sdr_backend="host", log_sample=False)
    # per-item metrics are exact means over all 6 items in both layouts
    assert abs(m1["sdr"] - m4["sdr"]) < 1e-6
    assert abs(m1["si_snri"] - m4["si_snri"]) < 1e-6
    assert abs(m1["si_snr"] - m4["si_snr"]) < 1e-4
    # max_items caps evaluated ITEMS: 3 items = 3 bs-1 batches
    m_cap = validate(eval_step4, state.params, state.batch_stats, l1,
                     compute_sdr=True, sdr_backend="host", log_sample=False,
                     max_items=3)
    sdrs = []
    l1.load_state(type(l1.state)(seed=l1.state.seed))
    for _ in range(3):
        b = next(l1)
        out = jax.device_get(eval_step4(state.params, state.batch_stats, b))
        n = int(b["wav_len"][0])
        sdrs.append(
            __import__("voicesplit_tpu.eval", fromlist=["bss_eval_sdr"]).bss_eval_sdr(
                np.asarray(b["target_wav"][0])[:n], np.asarray(out["est_wav"][0])[:n]
            )
        )
    assert abs(m_cap["sdr"] - np.mean(sdrs)) < 1e-6


def test_sweep(tiny_run, tmp_path):
    c, ap, state, eval_step, loader, ckpt_dir = tiny_run
    out = sweep_checkpoints(ckpt_dir, state, eval_step, loader, fast=True, out_dir=str(tmp_path))
    assert len(out["results"]) == 2
    assert (tmp_path / "fast_best_checkpoint.msgpack").exists()
    assert (tmp_path / "fast_sdr_curve.npy").exists()
    curve = np.load(tmp_path / "fast_sdr_curve.npy")
    assert curve.shape == (2, 2)
