"""Campaign/probe driver plumbing that must not lose records.

- `run_openset_folds.write_summary` is called incrementally after every
  fold (a campaign killed between folds keeps each completed fold's
  aggregate — the round-4 lost-session failure mode), so its pure
  behavior is pinned here.
- `run_reg_probes` builds each probe command from the campaign BASE
  with per-probe flag drops; a silently-missing drop would run the
  wrong ablation arm.
"""

import argparse
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scripts.run_openset_folds as rof  # noqa: E402
import scripts.run_reg_probes as rrp  # noqa: E402


def _report(tmp_path, name, best_val_db, steps=6000):
    rp = tmp_path / f"{name}.json"
    rp.write_text(json.dumps({
        "eval_protocol": f"open-set: {name}",
        "val_protocol": "val-unseen speakers x,y (dev/test split)",
        "encoder_eer": {"held_out_only": 0.1},
        "steps": steps,
        "si_snri_at_best_val_db": best_val_db,
        "best_val_step": 1000,
        "si_snri_end_db": best_val_db - 0.5,
        "si_snri_start_db": -3.0,
        "config": "probe",
    }))
    return str(rp)


def test_write_summary_incremental_mean(tmp_path, monkeypatch):
    monkeypatch.setattr(rof, "REPO", str(tmp_path))
    (tmp_path / "docs").mkdir()
    args = argparse.Namespace(val_k=2, steps=6000, ge2e_steps=2500,
                              extra="--x", out="logs/openset_test")

    r0 = _report(tmp_path, "fold0", 1.0)
    s, out_json = rof.write_summary([r0], args, 4)
    assert s["n_folds"] == 1
    assert s["mean_si_snri_at_best_val_db"] == 1.0
    assert os.path.basename(out_json) == "openset_test_folds.json"
    on_disk = json.load(open(out_json))
    assert on_disk["folds"][0]["si_snri_at_best_val_db"] == 1.0

    # second fold lands -> same file, updated mean; first fold kept
    r1 = _report(tmp_path, "fold1", -2.0)
    s2, out_json2 = rof.write_summary([r0, r1], args, 4)
    assert out_json2 == out_json
    on_disk = json.load(open(out_json))
    assert on_disk["n_folds"] == 2
    assert on_disk["mean_si_snri_at_best_val_db"] == -0.5
    assert [f["si_snri_at_best_val_db"] for f in on_disk["folds"]] == [1.0, -2.0]


def test_write_summary_carries_heldout_peak(tmp_path, monkeypatch):
    """RESULTS.md's campaign table quotes the held-out peak (step); the
    machine-readable summary must be able to reproduce that column
    (round-4 ADVICE low)."""
    monkeypatch.setattr(rof, "REPO", str(tmp_path))
    (tmp_path / "docs").mkdir()
    args = argparse.Namespace(val_k=2, steps=6000, ge2e_steps=2500,
                              extra="", out="logs/openset_test")
    rp = tmp_path / "fold0.json"
    rp.write_text(json.dumps({
        "si_snri_at_best_val_db": -0.5, "best_val_step": 950,
        "si_snri_heldout_peak_db": -0.27, "heldout_peak_step": 650,
        "si_snri_end_db": -1.77, "si_snri_start_db": -3.0,
    }))
    s, _ = rof.write_summary([str(rp)], args, 4)
    row = s["folds"][0]
    assert row["si_snri_heldout_peak_db"] == -0.27
    assert row["heldout_peak_step"] == 650


def test_resume_folds_in_existing_reports_without_running(tmp_path, monkeypatch):
    """--resume: folds with an existing report.json enter the summary
    and NO subprocess runs for them — continuing a partially-complete
    campaign re-runs only the missing folds."""
    monkeypatch.setattr(rof, "REPO", str(tmp_path))
    (tmp_path / "docs").mkdir()
    monkeypatch.setattr(rof, "mixable_ids",
                        lambda: [f"s{i}" for i in range(8)])
    out = tmp_path / "camp"
    for i in range(2):
        d = out / f"fold{i}"
        d.mkdir(parents=True)
        (d / "report.json").write_text(json.dumps(
            {"si_snri_at_best_val_db": float(-i)}))

    ran = []
    monkeypatch.setattr(
        rof.subprocess, "run",
        lambda cmd, **kw: ran.append(cmd) or argparse.Namespace(returncode=1))
    monkeypatch.setattr(sys, "argv", [
        "run_openset_folds.py", "--resume", "--folds", "4",
        "--holdout_k", "2", "--out", str(out)])
    rof.main()

    # folds 0/1 resumed (no run), folds 2/3 attempted (rc=1 -> excluded)
    demo_runs = [c for c in ran if any("demo_train" in str(a) for a in c)]
    assert len(demo_runs) == 2
    summary = json.load(open(
        tmp_path / "docs" / f"{os.path.basename(str(out))}_folds.json"))
    assert summary["n_folds"] == 2
    assert summary["mean_si_snri_at_best_val_db"] == -0.5


def test_commit_artifacts_force_adds_ignored_paths(tmp_path):
    """commit_artifacts must land gitignored artifacts in a real commit
    ('completed fold => durable committed artifact' by construction)."""
    import subprocess as sp

    repo = tmp_path / "r"
    repo.mkdir()
    sp.run(["git", "init", "-q"], cwd=repo, check=True)
    sp.run(["git", "config", "user.email", "t@t"], cwd=repo, check=True)
    sp.run(["git", "config", "user.name", "t"], cwd=repo, check=True)
    (repo / ".gitignore").write_text("logs/\n")
    (repo / "logs").mkdir()
    art = repo / "logs" / "report.json"
    art.write_text("{}")

    orig_repo = rof.REPO
    rof.REPO = str(repo)
    try:
        rof.commit_artifacts([str(art)], "fold 0 report")
    finally:
        rof.REPO = orig_repo
    tracked = sp.run(["git", "ls-files"], cwd=repo, capture_output=True,
                     text=True).stdout.split()
    assert "logs/report.json" in tracked
    log = sp.run(["git", "log", "--oneline"], cwd=repo, capture_output=True,
                 text=True).stdout
    assert "fold 0 report" in log


def test_probe_base_matches_campaign_control():
    # every probe must inherit the committed campaign's control recipe
    assert "--encoder_grid" in rrp.BASE
    assert "--corpus_dir" in rrp.BASE
    i = rrp.BASE.index("--ge2e_steps")
    assert rrp.BASE[i + 1] == "2500"


def test_probe_flag_drop_removes_flag_and_value():
    spec = rrp.PROBES["fold0_dense_enc"]
    base = list(rrp.BASE)
    for flag in spec.get("drop", ()):
        i = base.index(flag)
        del base[i:i + 2]
    assert "--encoder_grid" not in base
    # the value that followed it must be gone too, nothing else dropped
    assert "pitch:-2,2;vtlp:0.95,1.05;speed:0.9,1.1" not in base
    assert len(base) == len(rrp.BASE) - 2
    assert "--corpus_dir" in base


def test_probe_specs_change_exactly_one_lever():
    assert rrp.PROBES["fold1_dropout"]["extra"] == ["--dropout", "0.3"]
    assert rrp.PROBES["fold1_specaug"]["extra"] == ["--spec_augment", "24,40"]
    assert rrp.PROBES["fold0_dense_enc"]["extra"] == []
    assert rrp.PROBES["fold0_dense_enc"]["drop"] == ["--encoder_grid"]
    # r5 deconfound arms: each restores exactly one r3 lever
    assert rrp.PROBES["fold0_ge2e3000"]["drop"] == ["--ge2e_steps"]
    assert rrp.PROBES["fold0_ge2e3000"]["extra"] == ["--ge2e_steps", "3000"]
    assert rrp.PROBES["fold0_seenval"]["no_val"] is True
    assert rrp.PROBES["fold0_seenval"]["extra"] == []
    # r5 capacity arm: one lever, the BiLSTM width
    assert rrp.PROBES["fold1_lstm100"]["extra"] == ["--lstm_dim", "100"]
    assert "drop" not in rrp.PROBES["fold1_lstm100"]
    assert rrp.PROBES["fold1_ema"]["extra"] == ["--ema", "0.99"]


def test_probe_no_val_spec_omits_val_holdout(tmp_path, monkeypatch):
    """fold0_seenval must run demo_train WITHOUT --val_holdout_ids (the
    r3 seen-speaker selection protocol); every other probe passes it."""
    ran = []
    monkeypatch.setattr(
        rrp.subprocess, "run",
        lambda cmd, **kw: ran.append(cmd) or argparse.Namespace(returncode=1))
    monkeypatch.setattr(sys, "argv", [
        "run_reg_probes.py", "--only", "fold0_seenval,fold0_ge2e3000",
        "--out", str(tmp_path / "probes")])
    rrp.main()
    assert len(ran) == 2
    seenval, ge2e = ran
    assert "--val_holdout_ids" not in seenval
    assert "--val_holdout_ids" in ge2e
    i = ge2e.index("--ge2e_steps")
    assert ge2e[i + 1] == "3000"
    assert ge2e.count("--ge2e_steps") == 1


def test_probe_summary_merges_existing_record(tmp_path, monkeypatch):
    """A partial `--only` invocation must EXTEND docs/reg_probes_r4.json,
    not clobber the probes an earlier driver run already recorded."""
    docs = tmp_path / "docs"
    docs.mkdir()
    prior = {"steps": 6000,
             "probes": {"fold1_dropout": {"si_snri_at_best_val_db": -1.0}}}
    (docs / "reg_probes_r4.json").write_text(json.dumps(prior))
    monkeypatch.setattr(rrp, "REPO", str(tmp_path))

    def fake_run(cmd, **kw):
        out_dir = cmd[cmd.index("--out") + 1]
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump({"config": "probe", "steps": 6000,
                       "si_snri_at_best_val_db": 0.5, "best_val_step": 100,
                       "si_snri_heldout_peak_db": 0.7,
                       "heldout_peak_step": 90, "si_snri_end_db": 0.1}, f)
        return argparse.Namespace(returncode=0)

    monkeypatch.setattr(rrp.subprocess, "run", fake_run)
    monkeypatch.setattr(sys, "argv", [
        "run_reg_probes.py", "--only", "fold1_lstm100",
        "--out", str(tmp_path / "probes")])
    rrp.main()

    merged = json.loads((docs / "reg_probes_r4.json").read_text())
    assert set(merged["probes"]) == {"fold1_dropout", "fold1_lstm100"}
    assert merged["probes"]["fold1_dropout"]["si_snri_at_best_val_db"] == -1.0
    assert merged["probes"]["fold1_lstm100"]["si_snri_at_best_val_db"] == 0.5


# ---------------------------------------------------------------- run_long


def test_run_long_inherits_control_and_commits_summary(tmp_path, monkeypatch):
    import scripts.run_long as rl

    ran = []

    def fake_run(cmd, **kw):
        ran.append(cmd)
        out_dir = os.path.join(str(tmp_path), cmd[cmd.index("--out") + 1])
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump({"config": "long", "steps": 20000,
                       "si_snri_at_best_val_db": 0.8, "best_val_step": 9000,
                       "si_snri_heldout_peak_db": 1.0,
                       "heldout_peak_step": 8000, "si_snri_end_db": 0.6,
                       "si_snri_start_db": -2.0}, f)
        return argparse.Namespace(returncode=0)

    (tmp_path / "docs").mkdir()
    monkeypatch.setattr(rl, "REPO", str(tmp_path))
    monkeypatch.setattr(rl.subprocess, "run", fake_run)
    monkeypatch.setattr(sys, "argv", [
        "run_long.py", "--fold", "1", "--steps", "20000",
        "--dropout", "0.3"])
    rl.main()

    (cmd,) = ran
    # control recipe inherited verbatim from the probe BASE
    for flag in ("--encoder_grid", "--corpus_dir", "--augment"):
        assert flag in cmd
    assert cmd[cmd.index("--holdout_ids") + 1] == rrp.FOLD1["holdout"]
    assert cmd[cmd.index("--val_holdout_ids") + 1] == rrp.FOLD1["val"]
    assert cmd[cmd.index("--eval_every") + 1] == "100"
    assert cmd[cmd.index("--dropout") + 1] == "0.3"

    summary = json.loads((tmp_path / "docs" / "long_r5.json").read_text())
    assert summary["fold1"]["si_snri_at_best_val_db"] == 0.8
    assert summary["fold1"]["levers"] == ["--dropout", "0.3"]


def test_run_long_fails_loud_on_bad_rc(tmp_path, monkeypatch):
    import scripts.run_long as rl

    monkeypatch.setattr(rl, "REPO", str(tmp_path))
    monkeypatch.setattr(
        rl.subprocess, "run",
        lambda cmd, **kw: argparse.Namespace(returncode=3))
    monkeypatch.setattr(sys, "argv", ["run_long.py", "--fold", "0"])
    with pytest.raises(SystemExit):
        rl.main()


def test_probe_table_rows_delta_vs_fold_control():
    import scripts.probe_table as pt

    assert pt.fold_of("fold1_dropout") == 1
    assert pt.fold_of("fold0_dense_enc") == 0
    probes = {"fold1_x": {
        "si_snri_at_best_val_db": -2.5, "best_val_step": 100,
        "si_snri_heldout_peak_db": -1.0, "heldout_peak_step": 50,
        "si_snri_end_db": -2.0}}
    controls = {1: {"si_snri_at_best_val_db": -3.5}}
    (row,) = pt.rows(probes, controls)
    assert row["fold"] == 1
    assert row["delta_vs_control_db"] == pytest.approx(1.0)
    assert row["enc_window_eer"] is None


def test_run_long_fold_splits_match_campaign_record():
    import scripts.run_long as rl

    assert rl.FOLDS[0] == rrp.FOLD0
    assert rl.FOLDS[1] == rrp.FOLD1
    # folds 2/3 pinned to the committed campaign invocations
    # (logs/openset_r4/campaign.log)
    assert rl.FOLDS[2] == {"holdout": "3576,4153,4831,5849",
                           "val": "6241,6267"}
    assert rl.FOLDS[3] == {"holdout": "6241,6267,6841,84",
                           "val": "1585,1701"}
    # holdout and val never overlap within a fold
    for spec in rl.FOLDS.values():
        assert not (set(spec["holdout"].split(","))
                    & set(spec["val"].split(",")))
