"""Dev/test checkpoint-selection split path of `scripts/demo_train.py`
(round-3 VERDICT item 6: the --val_holdout_ids machinery must be tested
before a campaign relies on it) plus the EER-claim statistics
(`losses/ge2e.py::pairwise_eer_stats`, VERDICT item 3).

The end-to-end case runs demo_train.main() for real on a shrunken model
and an 8-speaker sub-corpus of the reference demo audios, and asserts:
(a) the clash/closed-set guards fire, (b) `val_protocol` and
`encoder_eer` (with trial counts + bootstrap CI) land in report.json,
(c) the VALIDATION iterator is built on exactly the --val_holdout_ids
speakers — not on train speakers — and those speakers are excluded from
training.
"""

import json
import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from voicesplit_tpu.losses.ge2e import pairwise_eer, pairwise_eer_stats  # noqa: E402

DEMO_CLEAN = "/root/reference/datasets/LibriSpeech/audios_demo/clean"
DEMO_REFERENCE = "/root/reference/datasets/LibriSpeech/audios_demo/reference"
# 8 of the 16 speakers known to survive the >=3 s-after-trim rule
# (the rotating-fold campaign ids, docs/openset_folds_r3.json)
SPK = ["1585", "1701", "1988", "2078", "251", "2902", "3081", "3170"]

needs_demo_audio = pytest.mark.skipif(
    not os.path.isdir(DEMO_CLEAN), reason="reference demo audios not present"
)


# ---------------------------------------------------------------- EER stats


def test_pairwise_eer_stats_matches_eer_and_counts(rng):
    ids = np.repeat(np.arange(6), 4)  # 6 speakers x 4 utts
    centers = rng.normal(size=(6, 16))
    emb = centers[ids] + 0.1 * rng.normal(size=(24, 16))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    st = pairwise_eer_stats(emb, ids, n_boot=200, seed=1)
    assert st["eer"] == pytest.approx(pairwise_eer(emb, ids))
    assert st["n_utts"] == 24
    assert st["n_trials"] == 24 * 23 // 2
    assert st["n_target"] == 6 * (4 * 3 // 2)
    assert st["n_target"] + st["n_nontarget"] == st["n_trials"]
    lo, hi = st["ci95"]
    assert 0.0 <= lo <= hi <= 1.0
    assert st["n_boot"] > 0


def test_pairwise_eer_stats_ci_wide_at_tiny_n(rng):
    # 3 speakers x 2 utts: 15 trials — a 0.0 point estimate must come
    # with a CI that reflects how little evidence that is
    ids = np.repeat(np.arange(3), 2)
    centers = rng.normal(size=(3, 8))
    emb = centers[ids] + 0.01 * rng.normal(size=(6, 8))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    st = pairwise_eer_stats(emb, ids, n_boot=300, seed=2)
    assert st["n_trials"] == 15
    assert "ci95" in st


def test_pairwise_eer_stats_groups_counts_cross_recording_trials(rng):
    """With ``groups``, only cross-group pairs are trials: windows of one
    recording share channel/content and must not score against each
    other (round-4 weak #4 — the powered-EER honesty guard)."""
    # 2 speakers x 2 recordings x 3 windows each = 12 rows, 4 groups
    ids = np.repeat(np.arange(2), 6)
    grp = np.repeat(np.arange(4), 3)
    centers = rng.normal(size=(2, 8))
    emb = centers[ids] + 0.1 * rng.normal(size=(12, 8))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    st = pairwise_eer_stats(emb, ids, n_boot=100, seed=3, groups=grp)
    assert st["n_utts"] == 12
    assert st["n_groups"] == 4
    # all pairs 66, minus 4 groups x C(3,2)=3 within-group pairs = 54
    assert st["n_trials"] == 54
    # target trials: same speaker, different recording = 2 spk x 3x3
    assert st["n_target"] == 18
    assert st["n_target"] + st["n_nontarget"] == st["n_trials"]
    assert "ci95" in st and st["n_boot"] > 0


def test_pairwise_eer_stats_within_group_trials(rng):
    """exclude_within_group=False keeps time-disjoint windows of one
    recording as target trials — the only target trials available when
    every speaker has a single recording (the demo corpus case where
    the strict protocol yields zero targets and a NaN EER)."""
    # 3 speakers x 1 recording x 4 windows
    ids = np.repeat(np.arange(3), 4)
    grp = ids.copy()  # one recording per speaker
    centers = rng.normal(size=(3, 8))
    emb = centers[ids] + 0.1 * rng.normal(size=(12, 8))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    strict = pairwise_eer_stats(emb, ids, n_boot=50, seed=7, groups=grp)
    assert strict["n_target"] == 0
    assert strict["eer"] != strict["eer"]  # NaN: no target trials

    lax = pairwise_eer_stats(emb, ids, n_boot=200, seed=7, groups=grp,
                             exclude_within_group=False)
    assert lax["within_group_trials"] is True
    assert lax["n_trials"] == 12 * 11 // 2
    assert lax["n_target"] == 3 * (4 * 3 // 2)
    assert lax["n_target_cross_group"] == 0  # caveat is visible
    assert lax["eer"] == lax["eer"]
    assert "ci95" in lax and lax["n_boot"] > 0


def test_pairwise_eer_stats_unique_groups_match_ungrouped(rng):
    """groups with one row each ≡ no groups for the point estimate and
    the trial counts (every pair is cross-group)."""
    ids = np.repeat(np.arange(4), 3)
    centers = rng.normal(size=(4, 8))
    emb = centers[ids] + 0.2 * rng.normal(size=(12, 8))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    a = pairwise_eer_stats(emb, ids, n_boot=50, seed=4)
    b = pairwise_eer_stats(emb, ids, n_boot=50, seed=4,
                           groups=np.arange(12))
    assert b["eer"] == pytest.approx(a["eer"])
    assert b["n_trials"] == a["n_trials"]
    assert b["n_target"] == a["n_target"]


def test_pairwise_eer_cluster_bootstrap_not_overconfident(rng):
    """Duplicating each recording's window many times must not shrink the
    cluster-bootstrap CI the way it shrinks a naive row bootstrap —
    the windows carry no new independent evidence."""
    # 3 speakers x 2 recordings; each recording = 8 near-identical rows
    n_spk, n_rec, n_win = 3, 2, 8
    ids = np.repeat(np.arange(n_spk), n_rec * n_win)
    grp = np.repeat(np.arange(n_spk * n_rec), n_win)
    centers = rng.normal(size=(n_spk, 8))
    rec_jitter = 0.6 * rng.normal(size=(n_spk * n_rec, 8))
    emb = centers[ids] + rec_jitter[grp] + 0.01 * rng.normal(size=(len(ids), 8))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    naive = pairwise_eer_stats(emb, ids, n_boot=200, seed=5)
    clus = pairwise_eer_stats(emb, ids, n_boot=200, seed=5, groups=grp)
    w_naive = naive["ci95"][1] - naive["ci95"][0]
    w_clus = clus["ci95"][1] - clus["ci95"][0]
    assert w_clus >= w_naive - 1e-9, (naive["ci95"], clus["ci95"])


def test_embed_utterance_windows_rows_and_pooling():
    """Per-window d-vectors: [n_win, D] unit rows; their mean-pool equals
    embed_utterance; stride override changes the window count."""
    import jax

    from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder
    from voicesplit_tpu.train.encoder import (
        embed_utterance,
        embed_utterance_windows,
    )

    class _StubAP:
        def __init__(self, mel):
            self._mel = mel

        def get_mel_bucketed(self, wav):
            return self._mel

    enc = SpeakerEncoder(num_mels=8, lstm_hidden=8, lstm_layers=1,
                         emb_dim=8, window=10, stride=5)
    import jax.numpy as jnp

    params = {"enc": enc.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 10)))["params"]}
    mel = np.random.default_rng(6).standard_normal((8, 33)).astype(np.float32)
    ap = _StubAP(mel)

    w = embed_utterance_windows(enc, params, ap, None)
    assert w.shape == ((33 - 10) // 5 + 1, 8)
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)

    pooled = w.mean(axis=0)
    pooled /= np.linalg.norm(pooled) + 1e-8
    np.testing.assert_allclose(
        embed_utterance(enc, params, ap, None), pooled, atol=1e-6)

    w2 = embed_utterance_windows(enc, params, ap, None, stride=10)
    assert w2.shape == ((33 - 10) // 10 + 1, 8)


# ------------------------------------------------------------ cheap guards


def _demo_main(argv, monkeypatch):
    import scripts.demo_train as dt

    monkeypatch.setattr(sys, "argv", ["demo_train.py"] + argv)
    dt.main()


def test_val_holdout_requires_open_set(monkeypatch, tmp_path, capsys):
    # closed-set eval draws from every mixable speaker, so any
    # --val_holdout_ids choice would overlap it; the guard must say
    # what is actually wrong (round-3 ADVICE item 1)
    with pytest.raises(SystemExit):
        _demo_main(["--val_holdout_ids", "251,2902", "--emb", "ge2e",
                    "--out", str(tmp_path / "run")], monkeypatch)
    err = capsys.readouterr().err
    assert "requires --holdout" in err


@needs_demo_audio
def test_val_holdout_clash_guard(monkeypatch, tmp_path, capsys):
    _make_subcorpus(monkeypatch, tmp_path)
    with pytest.raises(SystemExit) as ei:
        _demo_main(["--emb", "ge2e",
                    "--holdout_ids", "251,2902",
                    "--val_holdout_ids", "2902,3081",
                    "--out", str(tmp_path / "run")], monkeypatch)
    assert "overlap the test holdout" in str(ei.value)


def test_run_openset_folds_rejects_oversized_val_k(monkeypatch):
    import scripts.run_openset_folds as rof

    monkeypatch.setattr(sys, "argv",
                        ["run_openset_folds.py", "--val_k", "5",
                         "--holdout_k", "4"])
    with pytest.raises(SystemExit) as ei:
        rof.main()
    assert "--val_k 5 > --holdout_k 4" in str(ei.value)


# ------------------------------------------------- end-to-end tiny val run


def _make_subcorpus(monkeypatch, tmp_path):
    """Point demo_train at an 8-speaker subset of the demo audios."""
    import scripts.demo_train as dt

    clean = tmp_path / "clean"
    ref = tmp_path / "reference"
    clean.mkdir(exist_ok=True)
    ref.mkdir(exist_ok=True)
    for src, dst in ((DEMO_CLEAN, clean), (DEMO_REFERENCE, ref)):
        for f in sorted(os.listdir(src)):
            if f.endswith(".wav") and f.split("-")[0] in SPK:
                shutil.copyfile(os.path.join(src, f), dst / f)
    monkeypatch.setattr(dt, "DEMO_CLEAN", str(clean))
    monkeypatch.setattr(dt, "DEMO_REFERENCE", str(ref))


@needs_demo_audio
def test_cached_pseudo_dirs_of_holdouts_never_train(monkeypatch, tmp_path):
    """A shared --corpus_dir can contain pseudo-speaker dirs (spk~tag)
    cached by a PREVIOUS fold for a speaker this run holds out; they are
    warped copies of the held-out voice and must be excluded from the
    train pool even without --speaker_augment's base-id rebuild."""
    import voicesplit_tpu.config as vcfg
    import voicesplit_tpu.data.online as online

    _make_subcorpus(monkeypatch, tmp_path)
    corpus = tmp_path / "corpus_cache"
    corpus.mkdir()
    # pre-seed the cache with a pseudo dir for the future holdout 251
    # (as an earlier fold that TRAINED on 251 would have left behind)
    src = tmp_path / "clean"
    leak = corpus / "251~s+2.0"
    leak.mkdir()
    for f in os.listdir(src):
        if f.startswith("251-"):
            shutil.copyfile(src / f, leak / f)

    real_config = vcfg.Config

    def tiny_config():
        c = real_config()
        c.model.lstm_dim = 16
        c.model.conv_channels = 4
        c.model.conv_out_channels = 2
        # emb_dim stays 256: spectral d-vectors are fixed-width
        return c

    monkeypatch.setattr(vcfg, "Config", tiny_config)

    pools = []
    real_iter = online.OnlineMixIterator

    class RecordingIterator(real_iter):
        def __init__(self, speakers, **kw):
            pools.append(sorted(speakers))
            super().__init__(speakers, **kw)

    monkeypatch.setattr(online, "OnlineMixIterator", RecordingIterator)

    _demo_main([
        "--steps", "1", "--batch_size", "2", "--eval_batches", "1",
        "--emb", "spectral",  # no GE2E training: keeps the test fast
        "--holdout_ids", "251,2902",
        "--corpus_dir", str(corpus),
        "--out", str(tmp_path / "run"),
    ], monkeypatch)

    train_pool = pools[0]
    train_bases = {s.split("~")[0] for s in train_pool}
    assert "251" not in train_bases, train_pool
    assert "251~s+2.0" not in train_pool


@needs_demo_audio
def test_valsplit_end_to_end_tiny(monkeypatch, tmp_path):
    import voicesplit_tpu.config as vcfg
    import voicesplit_tpu.data.online as online

    _make_subcorpus(monkeypatch, tmp_path)

    real_config = vcfg.Config

    def tiny_config():
        c = real_config()
        c.model.lstm_dim = 16
        c.model.conv_channels = 4
        c.model.conv_out_channels = 2
        c.model.emb_dim = 16
        return c

    monkeypatch.setattr(vcfg, "Config", tiny_config)

    pools = []  # speaker-id sets per iterator construction (train/eval/val)
    real_iter = online.OnlineMixIterator

    class RecordingIterator(real_iter):
        def __init__(self, speakers, **kw):
            pools.append(sorted(speakers))
            super().__init__(speakers, **kw)

    monkeypatch.setattr(online, "OnlineMixIterator", RecordingIterator)

    out = tmp_path / "run"
    _demo_main([
        "--steps", "2", "--batch_size", "2", "--eval_batches", "1",
        "--emb", "ge2e", "--ge2e_steps", "2", "--lr", "1e-3",
        "--holdout_ids", "251,2902",
        "--val_holdout_ids", "3081,3170",
        "--out", str(out),
    ], monkeypatch)

    # (c) iterator wiring: train excludes val+test ids; eval == test
    # ids; the VALIDATION stream is exactly the --val_holdout_ids
    assert len(pools) == 3, pools
    train_pool, eval_pool, val_pool = pools
    assert eval_pool == ["251", "2902"]
    assert val_pool == ["3081", "3170"]
    train_bases = {s.split("~")[0] for s in train_pool}
    assert train_bases.isdisjoint({"251", "2902", "3081", "3170"})
    assert train_bases  # non-empty

    # (b) report fields
    rep = json.load(open(out / "report.json"))
    assert rep["val_protocol"].startswith("val-unseen speakers")
    assert "3081,3170" in rep["val_protocol"]
    ee = rep["encoder_eer"]
    assert set(ee) >= {"all_identity", "all_identity_stats",
                       "held_out_only", "held_out_only_stats",
                       "unseen_incl_val", "unseen_incl_val_stats"}
    for key in ("all_identity_stats", "held_out_only_stats",
                "unseen_incl_val_stats"):
        st = ee[key]
        assert st["n_trials"] > 0 and "ci95" in st
    # powered window-level EER (round-4 weak #4): many more trials than
    # the whole-utterance pools, cluster counts recorded
    for wkey, ukey in (("held_out_windows_stats", "held_out_only_stats"),
                       ("unseen_incl_val_windows_stats",
                        "unseen_incl_val_stats")):
        st = ee[wkey]
        assert st["n_trials"] > ee[ukey]["n_trials"], (wkey, st)
        assert st["n_groups"] >= 2 and "ci95" in st
    # held-out pool = 2 test speakers; incl-val adds the 2 val speakers
    assert ee["unseen_incl_val_stats"]["n_utts"] > ee["held_out_only_stats"]["n_utts"]
    assert rep["best_val_step"] in (1, 2)
    assert np.isfinite(rep["si_snri_at_best_val_db"])


@needs_demo_audio
def test_lstm_dim_capacity_lever(monkeypatch, tmp_path):
    """`--lstm_dim` shrinks the BiLSTM the model is actually built with
    (the capacity lever against the measured mask-net overfit) and is
    recorded in the report's config label for campaign tables."""
    import voicesplit_tpu.config as vcfg
    import voicesplit_tpu.models.masknet as mn

    _make_subcorpus(monkeypatch, tmp_path)

    real_config = vcfg.Config

    def tiny_config():
        c = real_config()
        c.model.conv_channels = 4
        c.model.conv_out_channels = 2
        # emb_dim stays 256: pseudo-mode d-vectors are 256-d
        return c

    monkeypatch.setattr(vcfg, "Config", tiny_config)

    seen = []
    real_make = mn.make_masknet

    def recording_make(c, **kw):
        seen.append(c.model.lstm_dim)
        return real_make(c, **kw)

    monkeypatch.setattr(mn, "make_masknet", recording_make)

    out = tmp_path / "run"
    _demo_main([
        "--steps", "2", "--batch_size", "2", "--eval_batches", "1",
        "--lstm_dim", "8", "--out", str(out),
    ], monkeypatch)

    assert seen == [8]
    rep = json.load(open(out / "report.json"))
    assert "+lstm8" in rep["config"]


@needs_demo_audio
def test_ema_lever_wires_averaged_eval(monkeypatch, tmp_path):
    """`--ema d` must drive one EMA update per train step and put the
    averaged params into every eval; label lands in report config."""
    import voicesplit_tpu.config as vcfg
    import voicesplit_tpu.train as vtrain

    _make_subcorpus(monkeypatch, tmp_path)

    real_config = vcfg.Config

    def tiny_config():
        c = real_config()
        c.model.lstm_dim = 16
        c.model.conv_channels = 4
        c.model.conv_out_channels = 2
        return c

    monkeypatch.setattr(vcfg, "Config", tiny_config)

    calls = {"updates": 0}
    real_factory = vtrain.make_ema_update

    def counting_factory(decay):
        assert decay == 0.95
        real_upd = real_factory(decay)

        def upd(ema, params):
            calls["updates"] += 1
            return real_upd(ema, params)

        return upd

    monkeypatch.setattr(vtrain, "make_ema_update", counting_factory)

    out = tmp_path / "run"
    _demo_main([
        "--steps", "3", "--batch_size", "2", "--eval_batches", "1",
        "--ema", "0.95", "--out", str(out),
    ], monkeypatch)

    assert calls["updates"] == 3
    rep = json.load(open(out / "report.json"))
    assert "+ema0.95" in rep["config"]
    assert np.isfinite(rep["si_snri_at_best_val_db"])


@needs_demo_audio
def test_save_checkpoint_keeps_best_val_artifact(monkeypatch, tmp_path):
    """--save_checkpoint must also write the best-val snapshot whenever
    selection picked an earlier step than the final one (under the
    measured overfit the final state is the worst artifact)."""
    import voicesplit_tpu.config as vcfg

    _make_subcorpus(monkeypatch, tmp_path)

    real_config = vcfg.Config

    def tiny_config():
        c = real_config()
        c.model.lstm_dim = 16
        c.model.conv_channels = 4
        c.model.conv_out_channels = 2
        return c

    monkeypatch.setattr(vcfg, "Config", tiny_config)

    out = tmp_path / "run"
    _demo_main([
        "--steps", "4", "--batch_size", "2", "--eval_batches", "1",
        "--eval_every", "1", "--save_checkpoint", "--out", str(out),
    ], monkeypatch)

    rep = json.load(open(out / "report.json"))
    final = out / "checkpoint_4.msgpack"
    assert final.exists()
    best_step = rep["best_val_step"]
    best = out / f"checkpoint_{best_step}.msgpack"
    assert best.exists(), (best_step, sorted(os.listdir(out)))
    if best_step != 4:
        from voicesplit_tpu.train.checkpoint import load_checkpoint

        ck = load_checkpoint(str(best))
        assert ck["step"] == best_step
