"""Jit-compiled train / eval steps.

The whole step — STFT of the raw waveform batch, mask-net forward,
masking, differentiable iSTFT, loss, backward, Adam update — is ONE
XLA program (the reference splits this across 14 CPU dataloader workers
computing STFTs + a GPU forward + host-side guards; `train.py:84-135`).
Feeding waveforms and doing DSP on-device keeps host→device traffic
minimal and lets XLA fuse the normalize/mask/denormalize elementwise
work into the surrounding matmuls.

Loss paths (selected statically from config, reference `train.py:74-79,
97-108`):

- ``power_law_compression`` — spectral loss between masked and target
  normalized spectrograms.
- ``si_snr`` — both specs are inverted with the *mixture phase* via the
  differentiable iSTFT, compared in the time domain with SI-SNR(+PIT,
  C=1), masked by true waveform length.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.losses import power_law_compressed_loss, si_snr, si_snr_with_pit
from voicesplit_tpu.train.state import TrainState


def _loss_from_outputs(
    config: Config,
    ap: AudioProcessor,
    output_spec: jnp.ndarray,  # [B, T, F] masked (normalized) spec
    target_spec: jnp.ndarray,  # [B, T, F]
    mixed_phase: jnp.ndarray,  # [B, T, F]
    wav_len: jnp.ndarray,  # [B] true sample counts
) -> jnp.ndarray:
    if config.loss.loss_name == "si_snr":
        est_wav = ap.spec2wav_batch(output_spec, mixed_phase)
        tgt_wav = ap.spec2wav_batch(target_spec, mixed_phase)
        return si_snr_with_pit(est_wav[:, None, :], tgt_wav[:, None, :], wav_len)
    if config.loss.loss_name == "power_law_compression":
        return power_law_compressed_loss(
            output_spec, target_spec, config.loss.power, config.loss.complex_loss_ratio
        )
    raise ValueError(f"unknown loss {config.loss.loss_name!r}")


def make_train_step(
    config: Config,
    model,
    ap: AudioProcessor,
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted ``(state, batch) -> (state, metrics)`` step.

    `batch` carries raw waveforms: ``mixed_wav [B, L]``,
    ``target_wav [B, L]``, ``emb [B, E]``, ``wav_len [B]``.
    Metrics include ``loss`` and ``grad_norm`` (both fp32 scalars); the
    NaN/explosion guard is evaluated on-device and surfaced as
    ``loss_exploded`` so the host loop can break like the reference's
    guard (`train.py:115-117`) without an extra transfer.
    """
    return jax.jit(
        _train_step_body(config, model, ap, tx),
        donate_argnums=(0,) if donate else (),
    )


def make_multi_train_step(
    config: Config,
    model,
    ap: AudioProcessor,
    tx: optax.GradientTransformation,
    steps_per_dispatch: int,
    donate: bool = True,
):
    """``(state, batches) -> (state, metrics)`` running K optimizer steps
    per dispatch via `lax.scan` over a stacked batch window [K, B, ...].

    The standard production-JAX train-loop unrolling for host-bound
    loops.  Measured on the tunneled v5e at flagship shape it is
    throughput-NEUTRAL (B=32: 238.7 ms/step at K=4 vs 238.8 at K=1) —
    XLA's async dispatch already pipelines back-to-back steps, so the
    "fixed dispatch overhead" in docs/KERNELS.md is latency, not
    throughput.  Kept for slow-host / high-step-rate regimes (tiny
    models, many chips) where the host loop genuinely can't keep up.
    Metrics are the LAST step's loss/grad_norm (what the host would log
    anyway at a >K logging cadence) plus an any-step ``loss_exploded``
    so the reference's explosion guard (`train.py:115-117`) still trips
    even mid-window.
    """
    single = _train_step_body(config, model, ap, tx)

    def multi(state: TrainState, batches):
        def body(st, b):
            st, m = single(st, b)
            return st, m

        state, ms = jax.lax.scan(body, state, batches)
        metrics = {
            "loss": ms["loss"][-1],
            "grad_norm": ms["grad_norm"][-1],
            "loss_exploded": jnp.any(ms["loss_exploded"]),
            "loss_mean": jnp.mean(ms["loss"]),
        }
        return state, metrics

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def _train_step_body(
    config: Config,
    model,
    ap: AudioProcessor,
    tx: optax.GradientTransformation,
):
    tc = config.train_config
    sa_time, sa_freq, sa_n = tc.spec_aug_time, tc.spec_aug_freq, tc.spec_aug_n
    dropout = config.model.dropout

    def loss_fn(params, batch_stats, batch, step):
        mixed_spec, mixed_phase = ap.wav2spec_batch(batch["mixed_wav"])
        target_spec, _ = ap.wav2spec_batch(batch["target_wav"])
        # train-time regularization rngs are derived from the step
        # counter (traced data, so one compilation serves all steps) —
        # no batch-schema change, deterministic given the run
        net_in = mixed_spec
        if sa_time or sa_freq:
            from voicesplit_tpu.dsp.augment import spec_time_freq_mask

            net_in = spec_time_freq_mask(
                mixed_spec,
                jax.random.fold_in(jax.random.PRNGKey(0x5A), step),
                sa_time, sa_freq, sa_n,
            )
        apply_kwargs = {}
        if dropout:
            apply_kwargs["rngs"] = {
                "dropout": jax.random.fold_in(jax.random.PRNGKey(0xD0), step)
            }
        mask, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            net_in,
            batch["emb"],
            train=True,
            mutable=["batch_stats"],
            **apply_kwargs,
        )
        if isinstance(mask, tuple):  # streaming model: (mask, lstm_carry)
            mask = mask[0]
        # the estimate always multiplies the CLEAN mixture spec —
        # SpecAugment corrupts the mask net's INPUT, not the signal path
        output = mask * mixed_spec
        loss = _loss_from_outputs(
            config, ap, output, target_spec, mixed_phase, batch["wav_len"]
        )
        return loss, updates["batch_stats"]

    def train_step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step
        )
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = {
            "loss": loss.astype(jnp.float32),
            "grad_norm": grad_norm.astype(jnp.float32),
            "loss_exploded": jnp.logical_or(
                jnp.logical_not(jnp.isfinite(loss)), loss > 1e8
            ),
        }
        return new_state, metrics

    return train_step


def make_eval_step(config: Config, model, ap: AudioProcessor):
    """Jitted eval: ``(params, batch_stats, batch) -> metrics + artifacts``.

    Computes the configured loss plus SI-SNR of the mixed-phase-inverted
    estimate (the reference's fast eval, `utils/generic_utils.py:531-558`)
    and returns the mask/specs for observability images.
    """

    def eval_step(params, batch_stats, batch):
        mixed_spec, mixed_phase = ap.wav2spec_batch(batch["mixed_wav"])
        target_spec, _ = ap.wav2spec_batch(batch["target_wav"])
        mask = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mixed_spec,
            batch["emb"],
            train=False,
        )
        if isinstance(mask, tuple):  # streaming model: (mask, lstm_carry)
            mask = mask[0]
        output = mask * mixed_spec
        loss = _loss_from_outputs(
            config, ap, output, target_spec, mixed_phase, batch["wav_len"]
        )
        # request the target's exact length: clip lengths off the hop
        # grid would otherwise invert short and break the comparison
        est_wav = ap.spec2wav_batch(
            output, mixed_phase, length=batch["target_wav"].shape[-1]
        )
        snr = si_snr(est_wav, batch["target_wav"], lengths=batch["wav_len"])
        return {
            "loss": loss.astype(jnp.float32),
            "si_snr": snr.astype(jnp.float32),  # [B]
            "mask": mask,
            "est_spec": output,
            "mixed_spec": mixed_spec,
            "target_spec": target_spec,
            "est_wav": est_wav,
            "mixed_phase": mixed_phase,
        }

    return jax.jit(eval_step)


def make_ema_update(decay: float):
    """Jitted Polyak/EMA parameter average: ``ema <- d*ema + (1-d)*p``.

    The generalization lever for the measured mask-net overfit (held-out
    SI-SNRi peaks early then regresses while train loss falls): evaluate
    and select checkpoints on the averaged weights instead of the raw
    trajectory.  No reference counterpart (the reference regularized with
    corpus scale); init the average AT the current params so the first
    ~1/(1-d) steps lag rather than pull toward zero.
    """

    def ema_update(ema_params, params):
        return jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
        )

    return jax.jit(ema_update)
