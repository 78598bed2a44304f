"""Long-horizon flagship run on the winning regularization recipe
(round-4 VERDICT item 7).

One fold, >=20k steps, the campaign control recipe plus whichever
lever(s) the round-5 probes (`docs/reg_probes_r4.json`) measured as
moving held-out SI-SNRi.  The question it answers: does held-out
SI-SNRi hold a positive plateau instead of peaking early and
regressing (fold-0 r4 signature: peak -0.27 dB @650 -> -1.77 @6000)?

The report + curve are committed the moment they land (campaign
durability rule, VERDICT r4 weak #2/#6) via
`run_openset_folds.commit_artifacts`.

Usage:
  python scripts/run_long.py --fold 0 --steps 20000 --dropout 0.3
  (flags this driver does not define are levers, passed straight
   through to demo_train in order)
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
sys.path.insert(0, REPO)

from scripts.run_reg_probes import BASE, FOLD0, FOLD1  # noqa: E402
from scripts.run_openset_folds import commit_artifacts  # noqa: E402

# fold 2/3 splits mirror the committed campaign record
# (docs/openset_r4_folds.json / logs/openset_r4/campaign.log)
FOLDS = {
    0: FOLD0,
    1: FOLD1,
    2: dict(holdout="3576,4153,4831,5849", val="6241,6267"),
    3: dict(holdout="6241,6267,6841,84", val="1585,1701"),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fold", type=int, default=0, choices=sorted(FOLDS))
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--eval_every", type=int, default=100,
                   help="curve resolution; every-50 evals dominate wall "
                   "time at this horizon")
    p.add_argument("--out", default=None,
                   help="default logs/long_r5/fold<N>")
    p.add_argument("--timeout", type=int, default=14400)
    p.add_argument("--commit", action="store_true")
    p.add_argument("--tag", default="long_r5",
                   help="summary key + default out-dir family")
    # every flag this parser does not know is a lever passed straight
    # to demo_train, in order (e.g. `run_long.py --fold 0 --dropout 0.3`)
    args, levers = p.parse_known_args()

    fold = FOLDS[args.fold]
    out_dir = args.out or os.path.join("logs", args.tag, f"fold{args.fold}")
    rp = os.path.join(out_dir, "report.json")
    cmd = [
        sys.executable, os.path.join(HERE, "demo_train.py"),
        "--steps", str(args.steps),
        "--eval_every", str(args.eval_every),
        "--holdout_ids", fold["holdout"],
        "--val_holdout_ids", fold["val"],
        "--out", out_dir,
    ] + list(BASE) + levers
    print(f"=== {args.tag}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, timeout=args.timeout)
    print(f"rc={r.returncode} in {time.time() - t0:.0f}s", flush=True)
    if r.returncode != 0 or not os.path.exists(os.path.join(REPO, rp)):
        raise SystemExit(r.returncode or 1)

    with open(os.path.join(REPO, rp)) as f:
        rep = json.load(f)
    out_json = os.path.join(REPO, "docs", f"{args.tag}.json")
    summary = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            summary = json.load(f)
    summary[f"fold{args.fold}"] = {
        k: rep.get(k)
        for k in ("config", "steps", "si_snri_at_best_val_db",
                  "best_val_step", "si_snri_heldout_peak_db",
                  "heldout_peak_step", "si_snri_end_db",
                  "si_snri_start_db")
    }
    summary[f"fold{args.fold}"]["levers"] = levers
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary[f"fold{args.fold}"], indent=2), flush=True)
    if args.commit:
        v = rep.get("si_snri_at_best_val_db")
        commit_artifacts(
            [os.path.join(REPO, rp), out_json],
            f"Long run {args.tag} fold {args.fold} ({args.steps} steps, "
            f"levers {' '.join(levers) or 'none'}): {v:+.2f} dB at best-val",
        )


if __name__ == "__main__":
    main()
