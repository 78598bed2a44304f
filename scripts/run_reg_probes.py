"""Round-4 regularization / encoder-grid probes (VERDICT r3 item 2).

Three single-fold probes against the committed r4 flagship campaign as
control (identical splits, seeds, corpus cache, dense mask-net grid,
SPARSE encoder grid, --val_k dev-speaker selection — so curves are
point-for-point comparable; campaign: logs/openset_r4,
docs/openset_r4_folds.json):

- fold1+dropout:   mask-net dropout 0.3 — the "plain regularizer" arm
- fold1+specaug:   SpecAugment input masking (24 frames, 40 bins) — the
                   "mixture-level corruption" arm
- fold0+dense_enc: the campaign recipe WITHOUT --encoder_grid, i.e. the
                   encoder trains on the full dense pseudo-voice pool —
                   the attribution arm for the sparse-encoder-grid
                   choice (an uncommitted r4 session observed the dense
                   grid degrading fold 0's encoder held-out EER;
                   committed evidence is r3's 0.022-sparse vs
                   0.200-dense fold-0 A/B)

Probes run fewer steps than the campaign (--steps, default 6000 to
match it): the r3 overfit signature (held-out curve peaks early then
regresses) shows well inside that horizon.

Usage: python scripts/run_reg_probes.py [--steps 8000] [--only a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# fold splits mirror scripts/run_openset_folds.py with holdout_k=4,
# val_k=2 over the 16 mixable ids (sorted order)
FOLD0 = dict(holdout="1585,1701,1988,2078", val="251,2902")
FOLD1 = dict(holdout="251,2902,3081,3170", val="3576,4153")

# mirrors the committed campaign's per-fold demo_train invocation
# (scripts/run_openset_folds.py + the r4 --extra), sparse encoder grid
# included — each probe then changes exactly one lever
BASE = [
    "--ge2e_steps", "2500", "--emb", "ge2e", "--lr", "1e-3", "--lr_decay",
    "--augment", "--speaker_augment", "--allow_short",
    "--pitch_semitones=-4,-2,2,4", "--vtlp_alphas", "0.85,0.95,1.05,1.15",
    "--encoder_grid", "pitch:-2,2;vtlp:0.95,1.05;speed:0.9,1.1",
    "--corpus_dir", "logs/openset_r4/corpus_cache",
]

PROBES = {
    "fold1_dropout": FOLD1 | {"extra": ["--dropout", "0.3"]},
    "fold1_specaug": FOLD1 | {"extra": ["--spec_augment", "24,40"]},
    # drop the sparse encoder grid -> encoder trains on the dense pool
    "fold0_dense_enc": FOLD0 | {"drop": ["--encoder_grid"], "extra": []},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--only", default=None,
                   help="comma-separated probe names (default: all)")
    p.add_argument("--out", default="logs/reg_probes_r4")
    p.add_argument("--timeout", type=int, default=5400, help="per probe, s")
    args = p.parse_args()

    names = list(PROBES)
    if args.only:
        want = [w.strip() for w in args.only.split(",")]
        bad = [w for w in want if w not in PROBES]
        if bad:
            raise SystemExit(f"unknown probes {bad} (available: {names})")
        names = want

    results = {}
    for name in names:
        spec = PROBES[name]
        out_dir = os.path.join(args.out, name)
        base = list(BASE)
        for flag in spec.get("drop", ()):  # remove flag + its value
            i = base.index(flag)
            del base[i:i + 2]
        cmd = [
            sys.executable, os.path.join(HERE, "demo_train.py"),
            "--steps", str(args.steps),
            "--holdout_ids", spec["holdout"],
            "--val_holdout_ids", spec["val"],
            "--out", out_dir,
        ] + base + spec["extra"]
        print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, timeout=args.timeout)
        print(f"{name}: rc={r.returncode} in {time.time() - t0:.0f}s",
              flush=True)
        rp = os.path.join(out_dir, "report.json")
        if r.returncode == 0 and os.path.exists(rp):
            with open(rp) as f:
                rep = json.load(f)
            results[name] = {
                k: rep.get(k)
                for k in ("config", "steps", "si_snri_at_best_val_db",
                          "best_val_step", "si_snri_heldout_peak_db",
                          "heldout_peak_step", "si_snri_end_db")
            }
            ee = rep.get("encoder_eer") or {}
            ho = ee.get("held_out_only_stats") or {}
            if ho:
                results[name]["encoder_heldout_eer"] = ho.get("eer")
                results[name]["encoder_heldout_eer_ci95"] = ho.get("ci95")

    out_json = os.path.join(REPO, "docs", "reg_probes_r4.json")
    with open(out_json, "w") as f:
        json.dump({"steps": args.steps, "probes": results}, f, indent=2)
    print(f"\nsummary -> {out_json}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
