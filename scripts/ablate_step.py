"""Full-train-step ablation profiling.

Measures the flagship jitted train step (bench.py shapes) and variants
with one component knocked out, attributing step time per component
from WITHIN the composed graph (standalone microbenches mislead: XLA
fuses differently in isolation, and the tunneled platform adds ~10-20 ms
per-call sync noise — see docs/KERNELS.md).

Run alone on the chip: concurrent programs contend and corrupt timings.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.losses import si_snr_with_pit, power_law_compressed_loss
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import create_train_state, make_optimizer


def timed(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def _sync(out):
    # device_get of one scalar leaf — block_until_ready is unreliable on
    # the tunneled axon platform (docs/KERNELS.md)
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf).astype(jnp.float32)))


def main(batch_size=16):
    c = Config()
    c.train_config.batch_size = batch_size
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    B = batch_size
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
        "seq_len": jnp.full((B,), T, jnp.int32),
    }

    def make_step(*, loss_name="si_snr", skip_conv=False, skip_lstm=False,
                  bn_eval=False, skip_stft=False, adam=True):
        def loss_fn(params, batch_stats, batch):
            if skip_stft:
                mixed_spec = jnp.abs(batch["mixed_wav"][:, :T * F // L * L]).reshape(B, -1)[:, : T * F].reshape(B, T, F)
                mixed_phase = jnp.zeros_like(mixed_spec)
                target_spec = mixed_spec * 0.5
            else:
                mixed_spec, mixed_phase = ap.wav2spec_batch(batch["mixed_wav"])
                target_spec, _ = ap.wav2spec_batch(batch["target_wav"])
            variables = {"params": params, "batch_stats": batch_stats}

            def apply_model(spec, emb):
                if skip_conv and skip_lstm:
                    return jax.nn.sigmoid(spec), batch_stats
                if skip_conv:
                    feats = jnp.broadcast_to(
                        spec[..., None], spec.shape + (8,)
                    ).reshape(B, T, 8 * F)
                    mask = model.apply(variables, feats, emb, train=not bn_eval,
                                       method=model.mask_head)
                    return mask, batch_stats
                if skip_lstm:
                    feats = model.apply(
                        variables, spec, train=not bn_eval,
                        method=model.conv_features,
                        mutable=["batch_stats"] if not bn_eval else False,
                    )
                    if not bn_eval:
                        feats, updates = feats
                        stats = updates["batch_stats"]
                    else:
                        stats = batch_stats
                    # cheap stand-in head so grads still flow
                    mask = jax.nn.sigmoid(feats[..., :F])
                    return mask, stats
                if bn_eval:
                    mask = model.apply(variables, spec, emb, train=False)
                    return mask, batch_stats
                mask, updates = model.apply(
                    variables, spec, emb, train=True, mutable=["batch_stats"]
                )
                return mask, updates["batch_stats"]

            mask, new_stats = apply_model(mixed_spec, batch["emb"])
            output = mask * mixed_spec
            if loss_name == "si_snr":
                est = ap.spec2wav_batch(output, mixed_phase)
                tgt = ap.spec2wav_batch(target_spec, mixed_phase)
                loss = si_snr_with_pit(est[:, None], tgt[:, None], batch["wav_len"])
            elif loss_name == "power_law":
                loss = power_law_compressed_loss(output, target_spec, 0.3, 0.113)
            else:  # "mse" — minimal spectral loss
                loss = jnp.mean((output - target_spec) ** 2)
            return loss, new_stats

        def step(state, batch):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch
            )
            if adam:
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
            else:
                new_opt = state.opt_state
                params = state.params
            return loss, params, new_opt

        return jax.jit(step)

    variants = [
        ("full (si_snr, train BN, adam)", {}),
        ("loss=mse (no iSTFTx2, no si-snr)", {"loss_name": "mse"}),
        ("loss=power_law", {"loss_name": "power_law"}),
        ("BN eval mode (no batch stats)", {"bn_eval": True}),
        ("no adam (grads only)", {"adam": False}),
        ("conv knocked out", {"skip_conv": True}),
        ("lstm head knocked out", {"skip_lstm": True}),
    ]
    results = {}
    for name, kw in variants:
        try:
            fn = make_step(**kw)
            ms = timed(fn, state, batch)
            results[name] = ms
            print(f"{name:42s} {ms:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:42s} FAILED: {type(e).__name__}: {e}", flush=True)
    full = results.get("full (si_snr, train BN, adam)")
    if full:
        print("\ndeltas vs full:")
        for name, ms in results.items():
            if name != "full (si_snr, train BN, adam)":
                print(f"  {name:40s} {full - ms:+8.1f} ms")


if __name__ == "__main__":
    main()
