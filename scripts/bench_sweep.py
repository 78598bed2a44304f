"""Batch-size / remat sweep over the train-step bench.

Runs `bench.run_bench` at several batch sizes, with and without the
opt-in conv remat (VOICESPLIT_REMAT_CONV=1 — trades recompute for
activation memory, the lever for fitting past the B=64 OOM), each in a
FRESH subprocess (env flags are read at trace time and XLA memory state
does not reset reliably in-process).  Prints one table; failures (OOM)
are recorded, not fatal.

Usage: python scripts/bench_sweep.py [--batches 16,32,48,64] [--remat]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(batch: int, remat: bool) -> dict:
    env = dict(os.environ)
    env["VOICESPLIT_REMAT_CONV"] = "1" if remat else "0"
    code = (
        "import json, bench\n"
        f"v, d = bench.run_bench(batch_size={batch})\n"
        "print('RESULT ' + json.dumps({'value': v, **d}))\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    # surface the REAL failure, not JAX's traceback-filtering
    # boilerplate: scan all of stderr for the error line (an OOM's
    # RESOURCE_EXHAUSTED sits well above the "JAX has removed its
    # internal frames" tail that a last-3-lines capture records)
    lines = [l.strip() for l in (out.stderr or out.stdout).splitlines()
             if l.strip()]
    keyed = [l for l in lines
             if any(t in l for t in ("RESOURCE_EXHAUSTED", "Error:",
                                     "error:", "Exception", "OOM"))
             and "internal frames" not in l]
    msg = keyed[-1] if keyed else (lines[-1] if lines else "no output")
    return {"error": msg[-300:], "stderr_tail": " / ".join(lines[-3:])[-300:]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,32,48,64")
    p.add_argument("--remat", action="store_true",
                   help="also sweep with VOICESPLIT_REMAT_CONV=1")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    rows = []
    for remat in ([False, True] if args.remat else [False]):
        for b in batches:
            r = run_one(b, remat)
            r.update({"batch": b, "remat": remat})
            rows.append(r)
            if "error" in r:
                print(f"B={b:<3} remat={int(remat)}  FAILED: {r['error']}",
                      flush=True)
            else:
                print(
                    f"B={b:<3} remat={int(remat)}  "
                    f"{r['value']:7.1f} audio-s/s/chip  "
                    f"step {r['step_ms']:6.1f} ms  mfu {r['mfu']:.3f}",
                    flush=True,
                )
    best = max((r for r in rows if "error" not in r),
               key=lambda r: r["value"], default=None)
    if best:
        print(f"\nbest: B={best['batch']} remat={int(best['remat'])} "
              f"-> {best['value']:.1f} audio-s/s/chip")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
