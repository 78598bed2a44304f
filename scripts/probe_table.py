"""Render the round-5 probe comparison table from the committed
artifacts (`docs/reg_probes_r4.json` vs the campaign controls in
`docs/openset_r4_folds.json`) — RESULTS.md quotes this output, so the
table is reproducible from the machine-readable record by construction.

Usage: python scripts/probe_table.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def fold_of(probe_name: str) -> int:
    return int(probe_name.split("_")[0].removeprefix("fold"))


def load_controls():
    with open(os.path.join(REPO, "docs", "openset_r4_folds.json")) as f:
        camp = json.load(f)
    controls = {}
    for row in camp["folds"]:
        n = int(row["fold"].split("fold")[-1].split("/")[0])
        controls[n] = row
    return controls


def rows(probes, controls):
    out = []
    for name, p in sorted(probes.items()):
        n = fold_of(name)
        ctl = controls.get(n, {})
        d_best = (p["si_snri_at_best_val_db"]
                  - ctl.get("si_snri_at_best_val_db", float("nan")))
        out.append({
            "probe": name,
            "fold": n,
            "best_val_db": p["si_snri_at_best_val_db"],
            "delta_vs_control_db": d_best,
            "best_val_step": p["best_val_step"],
            "peak_db": p["si_snri_heldout_peak_db"],
            "peak_step": p["heldout_peak_step"],
            "end_db": p["si_snri_end_db"],
            "control_best_val_db": ctl.get("si_snri_at_best_val_db"),
            "enc_window_eer": p.get("encoder_heldout_window_eer"),
            "enc_window_ci95": p.get("encoder_heldout_window_eer_ci95"),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    with open(os.path.join(REPO, "docs", "reg_probes_r4.json")) as f:
        probes = json.load(f)["probes"]
    table = rows(probes, load_controls())
    if args.json:
        print(json.dumps(table, indent=2))
        return
    print("| probe | fold | SI-SNRi @ best-val | Δ vs control | "
          "held-out peak (step) | end | enc window EER [CI] |")
    print("|---|---|---|---|---|---|---|")
    for r in table:
        ci = (f"{r['enc_window_eer']:.3f} {r['enc_window_ci95']}"
              if r["enc_window_eer"] is not None else "—")
        print(f"| {r['probe']} | {r['fold']} "
              f"| {r['best_val_db']:+.2f} (step {r['best_val_step']}) "
              f"| **{r['delta_vs_control_db']:+.2f}** "
              f"| {r['peak_db']:+.2f} ({r['peak_step']}) "
              f"| {r['end_db']:+.2f} | {ci} |")


if __name__ == "__main__":
    main()
