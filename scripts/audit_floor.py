"""Term-by-term audit of the practical-roofline floor (VERDICT r3 item 5).

`bench.py`'s two-term floor (MXU time = XLA-executed FLOPs / bf16 peak,
plus HBM time = analytic elementwise bytes / measured bandwidth) leaves
`practical_sol_fraction` ≈ 0.88 at the shipped B=32 default — ~28 ms of
step time the model does not place.  This script decomposes the gap with
MEASURED terms, using the same in-graph knockout methodology as
`scripts/ablate_step.py` (standalone microbenches mislead; XLA fuses
differently in isolation):

- trivial-dispatch cost: the bench loop's per-step host/dispatch floor,
  timed on a chained scalar op with the same sync-by-fetch pattern;
- recurrent-phase cost: full step minus the LSTM-knocked-out step — the
  sequential scan's per-iteration latency cannot run at MXU peak and is
  the structural candidate for the unmodeled time;
- Adam + BN-train deltas, same knockouts as the r2 ablation.

Writes docs/floor_audit.json and prints the audited floor:
  floor = mxu_term + bw_term + dispatch + (lstm_measured - lstm_mxu_alloc)
and its fraction of the measured step.  Run ALONE on the chip.

Usage: python scripts/audit_floor.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf).astype(jnp.float32)))


def timed(fn, *args, n=15, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def dispatch_floor_ms(n=50):
    """Per-step cost of the bench loop itself: a chained trivial jitted
    op, timed with the identical dispatch + sync-by-fetch pattern.  On
    the tunneled axon platform this is NOT ~0; it bounds any step."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    for _ in range(5):
        x = f(x)
    _sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    _sync(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--json", default="docs/floor_audit.json")
    args = p.parse_args()

    from voicesplit_tpu.config import Config
    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.losses import si_snr_with_pit
    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train import create_train_state, make_optimizer
    from voicesplit_tpu.utils.profiling import (
        V5E_BF16_FLOPS,
        masknet_train_step_cost,
        measure_hbm_bandwidth,
    )

    B = args.batch
    c = Config()
    c.train_config.batch_size = B
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    L = int(ap.sample_rate * c.audio.audio_len)
    T = ap.frames_for(L)
    F = ap.num_freq
    state = create_train_state(c, model, jax.random.PRNGKey(0), (B, T, F), tx)

    rng = np.random.default_rng(0)
    batch = {
        "emb": jnp.asarray(rng.standard_normal((B, 256)), jnp.float32),
        "target_wav": jnp.asarray(0.05 * rng.standard_normal((B, L)), jnp.float32),
        "mixed_wav": jnp.asarray(0.1 * rng.standard_normal((B, L)), jnp.float32),
        "wav_len": jnp.full((B,), L, jnp.int32),
    }

    def make_step(*, skip_lstm=False, adam=True, bn_eval=False):
        def loss_fn(params, batch_stats, b):
            mixed_spec, mixed_phase = ap.wav2spec_batch(b["mixed_wav"])
            target_spec, _ = ap.wav2spec_batch(b["target_wav"])
            variables = {"params": params, "batch_stats": batch_stats}
            if skip_lstm:
                feats = model.apply(
                    variables, mixed_spec, train=not bn_eval,
                    method=model.conv_features,
                    mutable=["batch_stats"] if not bn_eval else False,
                )
                if not bn_eval:
                    feats, updates = feats
                    stats = updates["batch_stats"]
                else:
                    stats = batch_stats
                mask = jax.nn.sigmoid(feats[..., :F])
            elif bn_eval:
                mask = model.apply(variables, mixed_spec, b["emb"], train=False)
                stats = batch_stats
            else:
                mask, updates = model.apply(
                    variables, mixed_spec, b["emb"], train=True,
                    mutable=["batch_stats"],
                )
                stats = updates["batch_stats"]
            output = mask * mixed_spec
            est = ap.spec2wav_batch(output, mixed_phase)
            tgt = ap.spec2wav_batch(target_spec, mixed_phase)
            loss = si_snr_with_pit(est[:, None], tgt[:, None], b["wav_len"])
            return loss, stats

        def step(state, b):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, b
            )
            if adam:
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
            else:
                params, new_opt = state.params, state.opt_state
            return loss, params, new_opt

        return jax.jit(step)

    print(f"B={B}  T={T}  F={F}", flush=True)
    disp = dispatch_floor_ms()
    print(f"trivial dispatch+sync floor      {disp:8.2f} ms/step", flush=True)

    full = make_step()
    full_ms = timed(full, state, batch)
    print(f"full step                        {full_ms:8.1f} ms", flush=True)
    no_lstm_ms = timed(make_step(skip_lstm=True), state, batch)
    print(f"lstm+head knocked out            {no_lstm_ms:8.1f} ms", flush=True)
    no_adam_ms = timed(make_step(adam=False), state, batch)
    print(f"no adam                          {no_adam_ms:8.1f} ms", flush=True)
    bn_eval_ms = timed(make_step(bn_eval=True), state, batch)
    print(f"BN eval mode                     {bn_eval_ms:8.1f} ms", flush=True)

    # model terms (identical to bench.py)
    cost = masknet_train_step_cost(B, T)
    measured_bw = measure_hbm_bandwidth()
    # XLA-executed flops of the REAL bench step (uses train/steps.py)
    from voicesplit_tpu.train import make_train_step

    bench_step = make_train_step(c, model, ap, tx, donate=False)
    xla_flops = None
    try:
        ca = bench_step.lower(state, batch).compile().cost_analysis()
        if ca:
            xla_flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001
        print(f"# cost_analysis unavailable: {e}", flush=True)

    mxu_ms = (xla_flops or cost.flops) / V5E_BF16_FLOPS * 1e3
    bw_ms = cost.hbm_bytes / measured_bw * 1e3

    # the LSTM+head phase: measured vs what the two-term model allots it
    lstm_meas_ms = full_ms - no_lstm_ms
    lstm_in = 8 * F + 256
    lstm_flops = 3 * 2 * (2 * B * T * lstm_in * 4 * 400 + 2 * B * T * 400 * 4 * 400)
    fc_flops = 3 * (2 * B * T * 800 * 600 + 2 * B * T * 600 * F)
    lstm_alloc_ms = (lstm_flops + fc_flops) / V5E_BF16_FLOPS * 1e3
    lstm_excess_ms = max(0.0, lstm_meas_ms - lstm_alloc_ms)

    two_term_ms = mxu_ms + bw_ms
    audited_ms = two_term_ms + disp + lstm_excess_ms
    report = {
        "batch": B,
        "full_step_ms": round(full_ms, 1),
        "dispatch_floor_ms": round(disp, 2),
        "lstm_head_measured_ms": round(lstm_meas_ms, 1),
        "lstm_head_mxu_alloc_ms": round(lstm_alloc_ms, 2),
        "lstm_head_excess_ms": round(lstm_excess_ms, 1),
        "adam_delta_ms": round(full_ms - no_adam_ms, 1),
        "bn_train_delta_ms": round(full_ms - bn_eval_ms, 1),
        "mxu_term_ms": round(mxu_ms, 1),
        "bw_term_ms": round(bw_ms, 1),
        "two_term_floor_ms": round(two_term_ms, 1),
        "two_term_sol_fraction": round(two_term_ms / full_ms, 4),
        "audited_floor_ms": round(audited_ms, 1),
        "audited_sol_fraction": round(audited_ms / full_ms, 4),
        "unplaced_ms": round(full_ms - audited_ms, 1),
        "measured_hbm_gb_per_s": round(measured_bw / 1e9, 1),
        "xla_executed_tflops": round((xla_flops or 0) / 1e12, 3),
    }
    print(json.dumps(report, indent=2), flush=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {args.json}", flush=True)


if __name__ == "__main__":
    main()
