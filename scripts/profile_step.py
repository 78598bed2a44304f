"""Break the train step into pieces and time each on the real chip.

Usage: python scripts/profile_step.py [B]

Times, with proper sync: full train step, forward-only loss, mask-net
forward alone, conv stack alone, BiLSTM alone, DSP (STFT+iSTFT) alone —
and prints the roofline comparison.  This is the measurement behind the
kernel-optimization priorities.
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step
from voicesplit_tpu.utils.profiling import masknet_train_step_cost, time_fn


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = Config()
    c.train_config.batch_size = B
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    L = int(ap.sample_rate * c.audio.audio_len)
    T = ap.frames_for(L)
    F = ap.num_freq

    state = create_train_state(c, model, jax.random.PRNGKey(0), (B, T, F), tx)
    step = make_train_step(c, model, ap, tx, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "emb": rng.standard_normal((B, 256)).astype(np.float32),
        "target_wav": (0.05 * rng.standard_normal((B, L))).astype(np.float32),
        "mixed_wav": (0.1 * rng.standard_normal((B, L))).astype(np.float32),
        "wav_len": np.full((B,), L, np.int32),
        "seq_len": np.full((B,), T, np.int32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    spec = jax.device_put(rng.uniform(0, 1, (B, T, F)).astype(np.float32))
    emb = batch["emb"]
    phase = jax.device_put(rng.uniform(-3, 3, (B, T, F)).astype(np.float32))

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pieces = {}

    pieces["full_train_step"] = time_fn(lambda: step(state, batch))

    fwd = jax.jit(lambda v, s, e: model.apply(v, s, e, train=False))
    pieces["masknet_forward"] = time_fn(lambda: fwd(variables, spec, emb))

    conv = jax.jit(
        lambda v, s: model.apply(v, s, train=False, method=model.conv_features)
    )
    pieces["conv_stack_fwd"] = time_fn(lambda: conv(variables, spec))

    feats = conv(variables, spec)
    head = jax.jit(
        lambda v, f, e: model.apply(v, f, e, train=False, method=model.mask_head)
    )
    pieces["lstm_head_fwd"] = time_fn(lambda: head(variables, feats, emb))

    w2s = jax.jit(ap.wav2spec_batch)
    pieces["stft"] = time_fn(lambda: w2s(batch["mixed_wav"]))
    s2w = jax.jit(ap.spec2wav_batch)
    pieces["istft"] = time_fn(lambda: s2w(spec, phase))

    # forward+backward of the mask-net alone (no DSP, MSE loss)
    def fwd_loss(p, bs, s, e):
        mask, _ = model.apply(
            {"params": p, "batch_stats": bs}, s, e, train=True, mutable=["batch_stats"]
        )
        return jnp.mean((mask - 0.5) ** 2)

    grad = jax.jit(jax.grad(fwd_loss))
    pieces["masknet_fwd_bwd"] = time_fn(lambda: grad(state.params, state.batch_stats, spec, emb))

    # conv stack fwd+bwd alone
    def conv_loss(p, bs, s):
        out = model.apply(
            {"params": p, "batch_stats": bs}, s, train=True,
            method=model.conv_features, mutable=["batch_stats"],
        )[0]
        return jnp.mean(out * out)

    cgrad = jax.jit(jax.grad(conv_loss))
    pieces["conv_fwd_bwd"] = time_fn(lambda: cgrad(state.params, state.batch_stats, spec))

    cost = masknet_train_step_cost(B, T)
    print(f"\n=== B={B} T={T} F={F} ===")
    for name, t in pieces.items():
        print(f"{name:20s} {t['median_s'] * 1e3:8.2f} ms")
    print(f"{'roofline (SoL)':20s} {cost.speed_of_light_s() * 1e3:8.2f} ms")
    print(f"MFU: {cost.mfu(pieces['full_train_step']['median_s']) * 100:.1f}%")


if __name__ == "__main__":
    main()
