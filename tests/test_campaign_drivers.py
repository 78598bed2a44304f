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
