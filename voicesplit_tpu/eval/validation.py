"""Validation loop: configured loss + SDR/SI-SNRi over a held-out set.

Capability of reference `validation()` (`utils/generic_utils.py:476-529`):
run the mask net over eval items, invert with the mixture phase, score
with the training criterion and SDR, and push one sample's audio/images
to the metrics logger.  Here the device work is one jitted batch step;
only the (CPU-bound) SDR projection runs on host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from voicesplit_tpu.data.dataset import BatchIterator
from voicesplit_tpu.eval.metrics import bss_eval_sdr, si_snr_improvement
from voicesplit_tpu.utils.logging import MetricsLogger


def validate(
    eval_step,
    params,
    batch_stats,
    loader: BatchIterator,
    logger: Optional[MetricsLogger] = None,
    step: int = 0,
    max_items: Optional[int] = None,
    log_sample: bool = True,
    compute_sdr: bool = True,
) -> Dict[str, float]:
    """Returns mean metrics: loss, si_snr, sdr, si_snri."""
    losses, snrs, sdrs, snris = [], [], [], []
    n_batches = loader.batches_per_epoch()
    if max_items is not None:
        n_batches = min(n_batches, max_items)
    loader.load_state(type(loader.state)(seed=loader.state.seed))  # rewind
    first_logged = False
    for b in range(n_batches):
        batch = next(loader)
        out = jax.device_get(eval_step(params, batch_stats, batch))
        losses.append(float(out["loss"]))
        snrs.extend(np.asarray(out["si_snr"]).tolist())
        if compute_sdr:
            for i in range(batch["target_wav"].shape[0]):
                n = int(batch["wav_len"][i])
                est = np.asarray(out["est_wav"][i])[:n]
                tgt = np.asarray(batch["target_wav"][i])[:n]
                mix = np.asarray(batch["mixed_wav"][i])[:n]
                sdrs.append(bss_eval_sdr(tgt, est))
                snris.append(si_snr_improvement(est, tgt, mix))
        if logger is not None and log_sample and not first_logged:
            first_logged = True
            logger.log_evaluation(
                test_loss=float(out["loss"]),
                sdr=float(sdrs[0]) if sdrs else 0.0,
                step=step,
                mixed_wav=batch["mixed_wav"][0],
                target_wav=batch["target_wav"][0],
                est_wav=np.asarray(out["est_wav"][0]),
                mixed_spec=np.asarray(out["mixed_spec"][0]),
                target_spec=np.asarray(out["target_spec"][0]),
                est_spec=np.asarray(out["est_spec"][0]),
                est_mask=np.asarray(out["mask"][0]),
            )
    result = {
        "loss": float(np.mean(losses)) if losses else float("nan"),
        "si_snr": float(np.mean(snrs)) if snrs else float("nan"),
    }
    if compute_sdr and sdrs:
        result["sdr"] = float(np.mean(sdrs))
        result["si_snri"] = float(np.mean(snris))
    if logger is not None:
        logger.log_scalars({f"eval_{k}": v for k, v in result.items()}, step)
    return result
