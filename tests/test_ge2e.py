"""GE2E loss (`losses/ge2e.py`) and encoder training (`cli/train_encoder.py`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicesplit_tpu.losses.ge2e import ge2e_softmax_loss, pairwise_eer


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_clustered_embeddings_score_lower_than_shuffled(rng):
    N, M, D = 4, 5, 16
    centers = _unit(rng.standard_normal((N, D)))
    emb = _unit(centers[:, None, :] + 0.05 * rng.standard_normal((N, M, D)))
    w, b = jnp.asarray(10.0), jnp.asarray(-5.0)
    good = float(ge2e_softmax_loss(jnp.asarray(emb), w, b))
    shuffled = emb.reshape(N * M, D).copy()
    rng.shuffle(shuffled, axis=0)
    bad = float(ge2e_softmax_loss(jnp.asarray(shuffled.reshape(N, M, D)), w, b))
    assert good < 0.1 < bad


def test_loss_gradients_finite_and_w_positive_clamped(rng):
    N, M, D = 3, 4, 8
    emb = _unit(rng.standard_normal((N, M, D))).astype(np.float32)

    def f(emb, w, b):
        return ge2e_softmax_loss(emb, w, b)

    g = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(emb), jnp.asarray(-3.0), jnp.asarray(0.0)
    )
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
    # negative w is clamped: loss equals the clamp-floor value
    l_neg = float(f(jnp.asarray(emb), jnp.asarray(-3.0), jnp.asarray(0.0)))
    l_floor = float(f(jnp.asarray(emb), jnp.asarray(1e-4), jnp.asarray(0.0)))
    assert abs(l_neg - l_floor) < 1e-6


def test_pairwise_eer_separability():
    rng = np.random.default_rng(0)
    centers = _unit(rng.standard_normal((4, 16)))
    emb = _unit(
        centers[:, None, :] + 0.05 * rng.standard_normal((4, 6, 16))
    ).reshape(24, 16)
    ids = np.repeat(np.arange(4), 6)
    assert pairwise_eer(emb, ids) < 0.05
    bad = _unit(rng.standard_normal((24, 16)))
    assert pairwise_eer(bad, ids) > 0.2


def _make_speaker_tree(tmp_path, rng, n_speakers=6, n_utts=3, seconds=1.2, sr=16000):
    from voicesplit_tpu.dsp.audio_io import save_wav_float

    t = np.arange(int(sr * seconds)) / sr
    for s in range(n_speakers):
        d = tmp_path / f"spk{s}"
        d.mkdir()
        f0 = 90 + 35 * s  # distinct fundamentals
        tilt = 0.4 + 0.1 * s
        for u in range(n_utts):
            phase = rng.uniform(0, 2 * np.pi)
            wav = np.zeros_like(t, dtype=np.float64)
            for h in range(1, 9):
                wav += (tilt ** h) * np.sin(2 * np.pi * f0 * h * t + phase * h)
            wav *= 0.1 * (1.0 + 0.2 * np.sin(2 * np.pi * (2 + u) * t))  # AM variety
            save_wav_float(wav.astype(np.float32), str(d / f"u{u}.wav"), sr)
    return str(tmp_path)


def test_train_encoder_cli_learns_and_checkpoint_loads(tmp_path, rng, capsys):
    """Tiny end-to-end run: loss decreases, checkpoint round-trips into
    the extraction CLI's native loader."""
    (tmp_path / "data").mkdir()
    root = _make_speaker_tree(tmp_path / "data", rng)
    out = tmp_path / "enc"

    from voicesplit_tpu.cli.train_encoder import main

    main([
        "--data_root", root,
        "--speakers_per_batch", "4",
        "--utts_per_speaker", "3",
        "--steps", "30",
        "--lr", "5e-3",
        "--lstm_hidden", "32",
        "--lstm_layers", "1",
        "--checkpoint_interval", "30",
        "--eval_interval", "0",
        "--log_interval", "5",
        "--holdout_speakers", "0",
        "--output_path", str(out),
    ])
    captured = capsys.readouterr().out
    losses = [
        float(line.split("loss")[1].split()[0])
        for line in captured.splitlines()
        if "loss" in line
    ]
    assert len(losses) >= 2 and losses[-1] < losses[0]

    ckpt = out / "encoder_30.msgpack"
    assert ckpt.exists()

    # native load path in the extraction CLI machinery
    from flax import serialization

    from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder

    with open(ckpt, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    enc = SpeakerEncoder(
        num_mels=int(blob["encoder"]["num_mels"]),
        lstm_hidden=int(blob["encoder"]["lstm_hidden"]),
        lstm_layers=int(blob["encoder"]["lstm_layers"]),
        emb_dim=int(blob["encoder"]["emb_dim"]),
    )
    mel = jnp.asarray(rng.standard_normal((2, blob["encoder"]["num_mels"], 80)), jnp.float32)
    emb = enc.apply({"params": blob["params"]["enc"]}, mel)
    assert emb.shape == (2, blob["encoder"]["emb_dim"])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4)
