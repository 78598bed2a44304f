"""Break the train step into pieces and time each on the real chip.

Usage: python scripts/profile_step.py [B]

Every timed piece is wrapped to return a SCALAR (jnp.sum of its outputs)
so syncing costs one float transfer — essential over the tunneled dev
chip, where fetching a full activation tensor dominates the timing.
"""

from __future__ import annotations

import os
import sys
import time

# self-locating: PYTHONPATH must stay untouched (prepending the repo
# breaks the axon PJRT plugin registration in sitecustomize)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step
from voicesplit_tpu.utils.profiling import masknet_train_step_cost


def _time_scalar(fn, *args, n_warmup=2, n_iters=10):
    """fn must return a scalar jax array."""
    for _ in range(n_warmup):
        r = fn(*args)
    float(jax.device_get(r))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jax.device_get(r))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


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

    def _full(s, b):
        # depend on the new state too — returning only the loss lets XLA
        # dead-code-eliminate the entire backward pass + optimizer update
        new_s, m = step(s, b)
        anchor = sum(jnp.sum(p).astype(jnp.float32) for p in jax.tree.leaves(new_s.params))
        return m["loss"] + 0.0 * anchor

    pieces["full_train_step"] = _time_scalar(jax.jit(_full), state, batch)
    pieces["masknet_fwd"] = _time_scalar(
        jax.jit(lambda v, s, e: jnp.sum(model.apply(v, s, e, train=False))),
        variables, spec, emb,
    )
    pieces["conv_stack_fwd"] = _time_scalar(
        jax.jit(lambda v, s: jnp.sum(
            model.apply(v, s, train=False, method=model.conv_features))),
        variables, spec,
    )
    pieces["stft_fwd"] = _time_scalar(
        jax.jit(lambda w: sum(jnp.sum(x) for x in ap.wav2spec_batch(w))),
        batch["mixed_wav"],
    )
    pieces["istft_fwd"] = _time_scalar(
        jax.jit(lambda s, p: jnp.sum(ap.spec2wav_batch(s, p))), spec, phase
    )

    def masknet_loss(p, bs, s, e):
        mask, _ = model.apply(
            {"params": p, "batch_stats": bs}, s, e, train=True, mutable=["batch_stats"]
        )
        return jnp.mean((mask - 0.5) ** 2)

    pieces["masknet_fwd_bwd"] = _time_scalar(
        jax.jit(lambda p, bs, s, e: sum(
            jnp.sum(g) for g in jax.tree.leaves(jax.grad(masknet_loss)(p, bs, s, e)))),
        state.params, state.batch_stats, spec, emb,
    )

    def conv_loss(p, bs, s):
        out = model.apply(
            {"params": p, "batch_stats": bs}, s, train=True,
            method=model.conv_features, mutable=["batch_stats"],
        )[0]
        return jnp.mean(out * out)

    pieces["conv_fwd_bwd"] = _time_scalar(
        jax.jit(lambda p, bs, s: sum(
            jnp.sum(g) for g in jax.tree.leaves(jax.grad(conv_loss)(p, bs, s)))),
        state.params, state.batch_stats, spec,
    )

    def head_loss(p, bs, f, e):
        m = model.apply({"params": p, "batch_stats": bs}, f, e, method=model.mask_head)
        return jnp.sum(m * m)

    feats = jax.jit(
        lambda v, s: model.apply(v, s, train=False, method=model.conv_features)
    )(variables, spec)
    pieces["lstm_head_fwd_bwd"] = _time_scalar(
        jax.jit(lambda p, bs, f, e: sum(
            jnp.sum(g) for g in jax.tree.leaves(jax.grad(head_loss)(p, bs, f, e)))),
        state.params, state.batch_stats, feats, emb,
    )

    cost = masknet_train_step_cost(B, T)
    print(f"\n=== B={B} T={T} F={F} backend={jax.default_backend()} ===")
    for name, t in pieces.items():
        print(f"{name:20s} {t * 1e3:8.2f} ms")
    print(f"{'roofline (SoL)':20s} {cost.speed_of_light_s() * 1e3:8.2f} ms")
    print(f"MFU: {cost.mfu(pieces['full_train_step']) * 100:.1f}%")


if __name__ == "__main__":
    main()
