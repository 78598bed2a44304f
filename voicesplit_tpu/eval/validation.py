"""Validation loop: configured loss + SDR/SI-SNRi over a held-out set.

Capability of reference `validation()` (`utils/generic_utils.py:476-529`):
run the mask net over eval items, invert with the mixture phase, score
with the training criterion and SDR, and push one sample's audio/images
to the metrics logger.  Here the device work is one jitted batch step,
and with the default "device" SDR backend the BSS_EVAL projection runs
batched on-chip too — only scalars cross the device→host boundary
(the estimated waveforms/spectrograms are fetched solely for the one
logged sample), where the reference pulls every estimate to the CPU
(`generic_utils.py:499-509`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from voicesplit_tpu.data.dataset import BatchIterator
from voicesplit_tpu.eval.metrics import (
    _sdr_and_si_snri_batch,
    bss_eval_sdr,
    si_snr_improvement,
)
from voicesplit_tpu.utils.logging import MetricsLogger


def _default_sdr_backend() -> str:
    """Device-batched SDR on an accelerator, host float64 on CPU."""
    return "host" if jax.default_backend() == "cpu" else "device"


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
    sdr_backend: str = "auto",
) -> Dict[str, float]:
    """Returns mean metrics: loss, si_snr, sdr, si_snri.

    ``sdr_backend``: "host" = per-item float64 numpy projection (exactly
    the reference's mir_eval-on-CPU arrangement, `generic_utils.py:509`);
    "device" = batched jitted projection (`bss_eval_sdr_batch`, <0.01 dB
    off the host values); "auto" picks "device" on an accelerator.

    ``max_items`` caps the number of evaluated ITEMS (not batches).
    Per-item metrics (si_snr/sdr/si_snri) exclude the loader's pad
    duplicates exactly; the scalar loss is a per-batch mean weighted by
    true item count, so a padded final batch contributes its duplicated
    item's loss with slight extra weight inside that one batch mean.
    """
    if sdr_backend == "auto":
        sdr_backend = _default_sdr_backend()
    losses, loss_weights, snrs, sdrs, snris = [], [], [], [], []
    n_batches = loader.batches_per_epoch()
    if max_items is not None:
        n_batches = min(n_batches, -(-max_items // loader.batch_size))
    loader.load_state(type(loader.state)(seed=loader.state.seed))  # rewind
    first_logged = False
    n_seen = 0
    for b in range(n_batches):
        host_batch = next(loader)
        # Valid-item count: the loader pads the final partial batch to
        # keep compiled shapes static (`pad_last`); padded duplicates are
        # trimmed from all per-item metrics and loss weighting below.
        n_valid = int(host_batch.get("n_valid", loader.batch_size))
        if max_items is not None:
            n_valid = min(n_valid, max_items - n_seen)
        n_seen += n_valid
        # Place the batch once; eval_step and the device SDR then share
        # the same buffers (device_put is a no-op on device arrays).
        batch = {k: jax.device_put(v) for k, v in host_batch.items()}
        out = eval_step(params, batch_stats, batch)
        losses.append(float(jax.device_get(out["loss"])))
        loss_weights.append(n_valid)
        snrs.extend(np.asarray(jax.device_get(out["si_snr"]))[:n_valid].tolist())
        if compute_sdr:
            if sdr_backend == "device":
                sdr_b, snri_b = _sdr_and_si_snri_batch(
                    out["est_wav"], batch["target_wav"], batch["mixed_wav"],
                    batch["wav_len"],
                )
                sdrs.extend(np.asarray(jax.device_get(sdr_b))[:n_valid].tolist())
                snris.extend(np.asarray(jax.device_get(snri_b))[:n_valid].tolist())
            else:
                # host path: waveforms come straight from the loader's
                # numpy arrays; only the estimate crosses device→host
                est_all = np.asarray(jax.device_get(out["est_wav"]))
                wav_len = np.asarray(host_batch["wav_len"])
                target = np.asarray(host_batch["target_wav"])
                mixed = np.asarray(host_batch["mixed_wav"])
                for i in range(n_valid):
                    n = int(wav_len[i])
                    est = est_all[i][:n]
                    tgt = target[i][:n]
                    mix = mixed[i][:n]
                    sdrs.append(bss_eval_sdr(tgt, est))
                    snris.append(si_snr_improvement(est, tgt, mix))
        if logger is not None and log_sample and not first_logged:
            first_logged = True
            logger.log_evaluation(
                test_loss=losses[-1],
                sdr=float(sdrs[0]) if sdrs else 0.0,
                step=step,
                mixed_wav=np.asarray(host_batch["mixed_wav"][0]),
                target_wav=np.asarray(host_batch["target_wav"][0]),
                est_wav=np.asarray(jax.device_get(out["est_wav"][0])),
                mixed_spec=np.asarray(jax.device_get(out["mixed_spec"][0])),
                target_spec=np.asarray(jax.device_get(out["target_spec"][0])),
                est_spec=np.asarray(jax.device_get(out["est_spec"][0])),
                est_mask=np.asarray(jax.device_get(out["mask"][0])),
            )
        if max_items is not None and n_seen >= max_items:
            break
    result = {
        "loss": float(np.average(losses, weights=loss_weights)) if losses else float("nan"),
        "si_snr": float(np.mean(snrs)) if snrs else float("nan"),
    }
    if compute_sdr and sdrs:
        result["sdr"] = float(np.mean(sdrs))
        result["si_snri"] = float(np.mean(snris))
    if logger is not None:
        logger.log_scalars({f"eval_{k}": v for k, v in result.items()}, step)
    return result
