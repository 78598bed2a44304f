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
                   choice.  NOTE on the evidence base: both committed
                   fold-0 EER numbers are SPARSE-grid runs — r3 sparse
                   gave 0.022 and r4 sparse gave 0.200, and those runs
                   differ by more than the grid (speaker pool 14→12 via
                   --val_k, GE2E steps 3000→2500).  The dense-grid-
                   degrades-EER attribution comes only from an
                   uncommitted r4 session and is motivation, not
                   evidence; this probe is what measures it.

Round-5 deconfounding arms (VERDICT r4 weak #3: fold 0 regressed
+0.10 → −0.51 and its encoder EER 0.022 → 0.200 under THREE
simultaneous protocol changes vs r3 — val_k split 14→12 train
speakers, GE2E steps 3000→2500, dense mask grid; each arm restores
exactly one lever to its r3 value on the r4 recipe):

- fold0_ge2e3000:  --ge2e_steps 3000 (r3 value; campaign uses 2500)
- fold0_seenval:   no --val_holdout_ids — checkpoint selection on
                   train speakers with a disjoint mixing seed (the r3
                   protocol), train pool back to 14 speakers

Probes run the SAME 6000-step horizon as the campaign (--steps,
default 6000): the r3 overfit signature (held-out curve peaks early
then regresses) shows well inside that horizon.

Usage: python scripts/run_reg_probes.py [--steps 6000] [--only a,b,...]
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
sys.path.insert(0, REPO)  # `scripts.run_openset_folds` import below

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
    # r3-value restorations, one lever each (deconfound the fold-0
    # regression: which of the three r3->r4 protocol changes caused it?)
    "fold0_ge2e3000": FOLD0 | {"drop": ["--ge2e_steps"],
                               "extra": ["--ge2e_steps", "3000"]},
    # no dev-speaker split: selection on train speakers w/ disjoint
    # seed (r3 protocol), train pool back to 14 speakers
    "fold0_seenval": FOLD0 | {"no_val": True, "extra": []},
    # capacity lever (round-5): the BiLSTM is 17.5M of 19M params vs a
    # ~14-voice corpus; 400->100 hidden (18.9M -> 5.2M params) attacks
    # the same overfit from the model side.  Fold 1 because its overfit
    # signature is the most extreme in the campaign (held-out peak at
    # step 150) and it pairs with the dropout/specaug fold-1 arms.
    "fold1_lstm100": FOLD1 | {"extra": ["--lstm_dim", "100"]},
    # trajectory lever (round-5): Polyak-averaged eval/selection weights
    # (~100-step window) — smooths the peak-then-regress trajectory
    # without touching data or capacity.
    "fold1_ema": FOLD1 | {"extra": ["--ema", "0.99"]},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--only", default=None,
                   help="comma-separated probe names (default: all)")
    p.add_argument("--out", default="logs/reg_probes_r4")
    p.add_argument("--timeout", type=int, default=5400, help="per probe, s")
    p.add_argument("--commit", action="store_true",
                   help="git add -f + commit each probe's report and the "
                   "summary as they land (campaign durability rule)")
    p.add_argument("--resume", action="store_true",
                   help="probes whose report.json already exists are folded "
                   "into the summary without re-running")
    args = p.parse_args()

    names = list(PROBES)
    if args.only:
        want = [w.strip() for w in args.only.split(",")]
        bad = [w for w in want if w not in PROBES]
        if bad:
            raise SystemExit(f"unknown probes {bad} (available: {names})")
        names = want

    # start from any summary already on disk so a partial `--only`
    # invocation extends the committed record instead of clobbering it
    out_json = os.path.join(REPO, "docs", "reg_probes_r4.json")
    results = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f).get("probes", {})

    def record(name, rp):
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
        how = ee.get("held_out_windows_stats") or {}
        if how:
            results[name]["encoder_heldout_window_eer"] = how.get("eer")
            results[name]["encoder_heldout_window_eer_ci95"] = how.get("ci95")
            results[name]["encoder_heldout_window_trials"] = how.get("n_trials")
        # summary written INCREMENTALLY (campaign durability rule)
        with open(out_json, "w") as f:
            json.dump({"steps": args.steps, "probes": results}, f, indent=2)
        if args.commit:
            from scripts.run_openset_folds import commit_artifacts

            v = results[name]["si_snri_at_best_val_db"]
            commit_artifacts(
                [rp, out_json],
                f"Regularization/deconfound probe {name}: "
                f"{v:+.2f} dB at best-val",
            )

    for name in names:
        spec = PROBES[name]
        out_dir = os.path.join(args.out, name)
        rp = os.path.join(out_dir, "report.json")
        if args.resume and os.path.exists(rp):
            print(f"{name}: report exists, --resume folds it in", flush=True)
            record(name, rp)
            continue
        base = list(BASE)
        for flag in spec.get("drop", ()):  # remove flag + its value
            i = base.index(flag)
            del base[i:i + 2]
        cmd = [
            sys.executable, os.path.join(HERE, "demo_train.py"),
            "--steps", str(args.steps),
            "--holdout_ids", spec["holdout"],
            "--out", out_dir,
        ] + base + spec["extra"]
        if not spec.get("no_val"):
            cmd += ["--val_holdout_ids", spec["val"]]
        print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, timeout=args.timeout)
        print(f"{name}: rc={r.returncode} in {time.time() - t0:.0f}s",
              flush=True)
        if r.returncode == 0 and os.path.exists(rp):
            record(name, rp)

    print(f"\nsummary -> {out_json}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
