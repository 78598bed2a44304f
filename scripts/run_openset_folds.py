"""Rotating leave-k-out open-set campaign driver (round-2 VERDICT item 2a).

Partitions the mixable demo speakers into ``n_folds`` disjoint held-out
groups, runs `scripts/demo_train.py` once per fold (each run trains its
own GE2E encoder on that fold's TRAIN split only, then the mask net),
and aggregates the per-fold reports into one across-fold table via
`scripts/openset_report.py` plus a machine-readable summary JSON.

The quoted number per fold is held-out SI-SNRi at the best-VALIDATION
step.  Validation defaults to train speakers with a disjoint mixing
seed (the reference's checkpoint-selection protocol); with ``--val_k``
each fold instead selects on a dev-speaker split (the next fold's
first ``val_k`` speakers, excluded from training — unseen-but-not-test
voices).  The campaign headline is the across-fold mean of that
number.

Usage:
  python scripts/run_openset_folds.py --steps 5000 [--folds 4]
      [--out logs/openset_r3] [--extra "--pitch_semitones -2,2 ..."]
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def mixable_ids() -> list:
    sys.path.insert(0, REPO)
    from scripts.demo_train import build_corpus
    from voicesplit_tpu.data.online import discover_utterances

    corpus = build_corpus("/tmp/openset_fold_probe")
    return sorted(discover_utterances(corpus, min_duration=3.0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--ge2e_steps", type=int, default=3000)
    p.add_argument("--holdout_k", type=int, default=4)
    p.add_argument("--val_k", type=int, default=0,
                   help="if >0, pass the NEXT fold's first val_k speakers as "
                   "--val_holdout_ids (dev/test split: checkpoint selection "
                   "on unseen-but-not-test voices; rotates with the folds)")
    p.add_argument("--folds", type=int, default=4)
    p.add_argument("--out", default="logs/openset_r3")
    p.add_argument("--extra", default="",
                   help="extra demo_train args appended verbatim, e.g. "
                   "'--pitch_semitones -2,2 --vtlp_alphas 0.9,1.1 "
                   "--emb_noise 0.05'")
    p.add_argument("--corpus_dir", default=None,
                   help="shared corpus cache passed to demo_train "
                   "(pseudo-speaker wav generation runs once, not per fold)")
    p.add_argument("--timeout", type=int, default=7200, help="per fold, s")
    p.add_argument("--resume", action="store_true",
                   help="folds whose report.json already exists are folded "
                   "into the summary without re-running (continue a campaign "
                   "a previous session completed partially)")
    p.add_argument("--commit", action="store_true",
                   help="git add -f + commit each fold's report and the "
                   "summary the moment they land — 'completed fold ⇒ "
                   "durable committed artifact' holds by construction "
                   "(logs/ is gitignored; two rounds lost campaign "
                   "artifacts to exactly this)")
    args = p.parse_args()

    if args.val_k > args.holdout_k:
        raise SystemExit(
            f"--val_k {args.val_k} > --holdout_k {args.holdout_k}: val ids "
            "are drawn from the NEXT fold's holdout block and would spill "
            "into the fold after it")

    ids = mixable_ids()
    k, n = args.holdout_k, args.folds
    if n * k > len(ids):
        raise SystemExit(f"{n} folds x {k} held-out > {len(ids)} mixable ids")
    print(f"{len(ids)} mixable speakers; {n} folds of {k} held-out", flush=True)

    reports = []
    for i in range(n):
        fold_ids = ids[i * k:(i + 1) * k]
        out_dir = os.path.join(args.out, f"fold{i}")
        rp = os.path.join(out_dir, "report.json")
        if args.resume and os.path.exists(rp):
            print(f"fold {i}: report exists, --resume folds it in without "
                  f"re-running ({rp})", flush=True)
            reports.append(rp)
            write_summary(reports, args, k)
            continue
        cmd = [
            sys.executable, os.path.join(HERE, "demo_train.py"),
            "--steps", str(args.steps),
            "--ge2e_steps", str(args.ge2e_steps),
            "--emb", "ge2e",
            "--holdout_ids", ",".join(fold_ids),
            "--lr", "1e-3", "--lr_decay",
            "--augment", "--speaker_augment", "--allow_short",
            "--out", out_dir,
        ] + shlex.split(args.extra)
        if args.corpus_dir:
            cmd += ["--corpus_dir", args.corpus_dir]
        if args.val_k:
            nxt = ids[((i + 1) % n) * k:((i + 1) % n) * k + args.val_k]
            assert len(nxt) == args.val_k, (nxt, args.val_k)
            cmd += ["--val_holdout_ids", ",".join(nxt)]
        print(f"\n=== fold {i}: holdout {fold_ids} ===\n{' '.join(cmd)}",
              flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, timeout=args.timeout)
        print(f"fold {i}: rc={r.returncode} in {time.time() - t0:.0f}s",
              flush=True)
        if r.returncode == 0 and os.path.exists(rp):
            reports.append(rp)
            # write the summary INCREMENTALLY: a campaign killed between
            # folds (session timeout, preemption) keeps every completed
            # fold's aggregate on disk — losing an entire campaign to a
            # missed final write is the round-4 failure mode this guards
            summary, out_json = write_summary(reports, args, k)
            if args.commit:
                with open(rp) as f:
                    v = json.load(f).get("si_snri_at_best_val_db")
                commit_artifacts(
                    [rp, out_json],
                    f"Open-set campaign {os.path.basename(args.out)}: "
                    f"fold {i} report ({v:+.2f} dB at best-val, "
                    f"{len(reports)}-fold mean "
                    f"{summary['mean_si_snri_at_best_val_db']:+.2f})",
                )

    if reports:
        subprocess.run(
            [sys.executable, os.path.join(HERE, "openset_report.py")] + reports,
            cwd=REPO,
        )
        summary, out_json = write_summary(reports, args, k)
        print(f"\nsummary -> {out_json}")
        print(json.dumps({k: v for k, v in summary.items() if k != "folds"}))


def commit_artifacts(paths, msg):
    """Force-add (logs/ is gitignored) and commit campaign artifacts.

    Failures are printed, not raised: a commit hiccup must not kill the
    remaining folds — the artifacts stay on disk either way."""
    # `git commit -- <paths>` scopes the commit to the artifacts even if
    # a concurrent working session has other changes staged
    for cmd in (["git", "add", "-f"] + list(paths),
                ["git", "commit", "-m", msg, "--"] + list(paths)):
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"[commit_artifacts] {' '.join(cmd)} -> rc={r.returncode}\n"
                  f"{r.stdout}{r.stderr}", flush=True)


def write_summary(reports, args, k):
    vals = []
    rows = []
    for rp in reports:
        with open(rp) as f:
            rep = json.load(f)
        rows.append({
            "fold": rp,
            "holdout": rep.get("eval_protocol"),
            "val_protocol": rep.get("val_protocol"),
            "encoder_eer": rep.get("encoder_eer"),
            "steps": rep.get("steps"),
            "si_snri_at_best_val_db": rep.get("si_snri_at_best_val_db"),
            "best_val_step": rep.get("best_val_step"),
            # diagnostic-only held-out peak (RESULTS.md's campaign table
            # quotes it, so the machine-readable summary must carry it)
            "si_snri_heldout_peak_db": rep.get("si_snri_heldout_peak_db"),
            "heldout_peak_step": rep.get("heldout_peak_step"),
            "si_snri_end_db": rep.get("si_snri_end_db"),
            "si_snri_start_db": rep.get("si_snri_start_db"),
            "config": rep.get("config"),
        })
        v = rep.get("si_snri_at_best_val_db")
        if v is not None:
            vals.append(v)
    summary = {
        "n_folds": len(reports),
        "holdout_k": k,
        "val_k": args.val_k,
        "steps": args.steps,
        "ge2e_steps": args.ge2e_steps,
        "extra": args.extra,
        "mean_si_snri_at_best_val_db": (
            sum(vals) / len(vals) if vals else None
        ),
        "folds": rows,
    }
    # summary file is named after the campaign's --out dir so two
    # campaigns (e.g. sparse vs dense pseudo-voice grids) never
    # overwrite each other's record
    out_json = os.path.join(
        REPO, "docs", f"{os.path.basename(args.out.rstrip('/'))}_folds.json"
    )
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    return summary, out_json


if __name__ == "__main__":
    main()
