"""Aggregate open-set fold reports into one table.

Each `scripts/demo_train.py --holdout[_ids]` run writes a `report.json`;
this prints a per-fold table (protocol, steps, the held-out SI-SNRi at
the best-VALIDATION step — the only number the protocol allows quoting —
and the end-of-run value) plus the across-fold mean, ready to paste into
docs/RESULTS.md.

Usage: python scripts/openset_report.py logs/*/report.json
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        ee = r.get("encoder_eer") or {}
        # prefer the POWERED window-level stats (cross-recording trials,
        # recording-cluster bootstrap) over the ~50-trial whole-
        # utterance pools when a report carries them
        ho = ee.get("held_out_windows_stats") or {}
        if not ho or ho.get("eer") != ho.get("eer"):  # absent or NaN
            ho = ee.get("held_out_only_stats") or {}
        if ho:
            # an EER is only quotable with its trial count + CI
            ci = ho.get("ci95")
            eer_s = (f"{ho['eer']:.3f}[n={ho['n_trials']}"
                     + (f",CI {ci[0]:.2f}-{ci[1]:.2f}]" if ci else "]"))
        elif "held_out_only" in ee:
            eer_s = f"{ee['held_out_only']:.3f}[n=?]"
        else:
            eer_s = "--"
        rows.append({
            "path": p,
            "protocol": r.get("eval_protocol", "?"),
            "config": r.get("config", "?"),
            "steps": r.get("steps"),
            "best_val_step": r.get("best_val_step"),
            "at_best_val": r.get("si_snri_at_best_val_db"),
            "end": r.get("si_snri_end_db"),
            "start": r.get("si_snri_start_db"),
            "eer": eer_s,
        })
    w = max(len(r["path"]) for r in rows)
    print(f"{'report':<{w}}  {'steps':>6}  {'best@val':>9}  {'end':>7}  "
          f"{'start':>7}  {'held-out EER':>24}  protocol")
    def fmt(v, spec):
        # older round-1 reports may lack any of these fields — show "--"
        return "--" if v is None else format(v, spec)

    for r in rows:
        print(f"{r['path']:<{w}}  {fmt(r['steps'], '>6')!s:>6}  "
              f"{fmt(r['at_best_val'], '+.2f'):>9}  "
              f"{fmt(r['end'], '+.2f'):>7}  {fmt(r['start'], '+.2f'):>7}  "
              f"{r['eer']:>24}  {r['protocol']}")
    vals = [r["at_best_val"] for r in rows if r["at_best_val"] is not None]
    if len(vals) > 1:
        print(f"\nacross-fold mean held-out SI-SNRi at best-val: "
              f"{np.mean(vals):+.2f} dB  (n={len(vals)} folds)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
