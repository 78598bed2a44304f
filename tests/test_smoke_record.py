"""The committed on-chip smoke-gate record must be green.

Round-4 weak #1: `docs/tpu_smoke.json` shipped with ``"ok": false``
(the gate had been run against a stale checkout and the failing record
committed without a re-run) — the code was healthy but the tree's own
gate record said otherwise for a full round.  A gate whose committed
record can silently be red has lost the point of being a gate, so this
tripwire makes a red record fail CI instead.

If this test fails: re-run ``python scripts/tpu_smoke.py --json
docs/tpu_smoke.json`` on the TPU host and commit the record it writes
(or fix whatever actually broke on-chip first).
"""

import json
import os

RECORD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "tpu_smoke.json")


def test_committed_gate_is_green():
    with open(RECORD) as f:
        rec = json.load(f)
    failing = [r.get("check") for r in rec.get("checks", [])
               if not r.get("ok")]
    assert rec.get("ok") is True, (
        f"committed smoke-gate record is RED (failing: {failing}) — "
        "re-run scripts/tpu_smoke.py on the TPU host and commit the "
        "green record, or fix the on-chip regression it caught")


def test_gate_record_covers_the_accelerator_paths():
    """The record must actually contain the env-gated accelerator checks
    (an empty-but-ok record would make the tripwire vacuous)."""
    with open(RECORD) as f:
        rec = json.load(f)
    names = {r.get("check") for r in rec.get("checks", [])}
    assert {"pallas_lstm", "train_step"} <= names, names
