"""Checkpoint sweeps with best-checkpoint selection.

Capability of reference `test_all_checkpoints.py:31-130` (full eval of
every checkpoint, tracking best-SDR and best-loss, copying
``best_checkpoint``, saving the SDR curve) and
`test_fast_all_checkpoints.py` (batched SI-SNR-only fast sweep) — minus
the reference's `best_sdr`-NameError bug (`test_fast_all_checkpoints.py:121`,
deliberately not replicated).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from voicesplit_tpu.config import Config
from voicesplit_tpu.data.dataset import BatchIterator
from voicesplit_tpu.eval.validation import validate
from voicesplit_tpu.train.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    restore_train_state,
)


def sweep_checkpoints(
    checkpoint_dir: str,
    template_state,
    eval_step,
    loader: BatchIterator,
    fast: bool = False,
    max_items: Optional[int] = None,
    out_dir: Optional[str] = None,
    sdr_backend: str = "auto",
) -> Dict:
    """Evaluate every checkpoint in `checkpoint_dir`.

    `fast=True` skips the host-side SDR projection (SI-SNR only — the
    reference's "fast" sweep).  Copies ``best_checkpoint.msgpack`` (by
    SDR, or by SI-SNR in fast mode) and ``best_loss_checkpoint.msgpack``,
    and saves the metric curve as ``sdr_curve.npy``.
    """
    out_dir = out_dir or checkpoint_dir
    paths = list_checkpoints(checkpoint_dir)
    if not paths:
        raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
    results: List[Dict] = []
    best_metric, best_path = -np.inf, None
    best_loss, best_loss_path = np.inf, None
    for path in paths:
        payload = load_checkpoint(path)
        state, _ = restore_train_state(payload, template_state)
        m = validate(
            eval_step, state.params, state.batch_stats, loader,
            max_items=max_items, compute_sdr=not fast, log_sample=False,
            sdr_backend=sdr_backend,
        )
        m["path"] = path
        m["step"] = int(payload["step"])
        results.append(m)
        key = m["si_snr"] if fast else m.get("sdr", m["si_snr"])
        if key > best_metric:
            best_metric, best_path = key, path
        if m["loss"] < best_loss:
            best_loss, best_loss_path = m["loss"], path

    prefix = "fast_" if fast else ""
    if best_path is None:
        # every checkpoint's metric was NaN (diverged run): report it
        # instead of crashing on copyfile(None) AFTER the whole sweep ran
        print(" ! sweep: all checkpoints scored NaN; no best checkpoint copied")
        return {
            "results": results,
            "best_path": None,
            "best_metric": float("nan"),
            "best_loss_path": best_loss_path,
            "best_loss": float(best_loss),
        }
    shutil.copyfile(best_path, os.path.join(out_dir, f"{prefix}best_checkpoint.msgpack"))
    if best_loss_path:
        shutil.copyfile(
            best_loss_path, os.path.join(out_dir, f"{prefix}best_loss_checkpoint.msgpack")
        )
    curve = np.array(
        [[r["step"], r.get("sdr", r["si_snr"])] for r in results], dtype=np.float64
    )
    np.save(os.path.join(out_dir, f"{prefix}sdr_curve.npy"), curve)
    return {
        "results": results,
        "best_path": best_path,
        "best_metric": float(best_metric),
        "best_loss_path": best_loss_path,
        "best_loss": float(best_loss),
    }
