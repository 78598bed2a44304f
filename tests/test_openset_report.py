"""`scripts/openset_report.py` — the fold-campaign aggregation table.

run_openset_folds.py invokes this at campaign end; a formatting crash
there would eat the across-fold summary, so the table is pinned for all
three report generations: round-1 (no EER fields), round-3 (scalar
EERs), and round-4+ (EER stats with trial counts + bootstrap CI).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.openset_report import main  # noqa: E402


def _write(tmp_path, name, extra):
    rep = {
        "eval_protocol": "open-set: 4 held-out speakers",
        "config": "flagship",
        "steps": 100,
        "best_val_step": 50,
        "si_snri_at_best_val_db": -1.0,
        "si_snri_end_db": -1.5,
        "si_snri_start_db": -3.0,
        **extra,
    }
    p = tmp_path / name
    p.write_text(json.dumps(rep))
    return str(p)


def test_all_report_generations_render(tmp_path, capsys):
    paths = [
        _write(tmp_path, "r1.json", {"si_snri_at_best_val_db": None}),
        _write(tmp_path, "r3.json",
               {"encoder_eer": {"all_identity": 0.02, "held_out_only": 0.13}}),
        _write(tmp_path, "r4.json", {"encoder_eer": {
            "all_identity": 0.02,
            "held_out_only": 0.178,
            "held_out_only_stats": {"eer": 0.178, "n_trials": 55,
                                    "ci95": [0.0, 0.2126]},
        }}),
    ]
    main(paths)
    out = capsys.readouterr().out
    assert "held-out EER" in out
    assert "--" in out  # r1: no EER
    assert "0.130[n=?]" in out  # r3: scalar without trial count
    assert "0.178[n=55,CI 0.00-0.21]" in out  # r4: qualified claim
    assert "across-fold mean" in out  # n=2 non-None values


def test_single_report_no_mean(tmp_path, capsys):
    main([_write(tmp_path, "one.json", {})])
    out = capsys.readouterr().out
    assert "across-fold mean" not in out
