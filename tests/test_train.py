"""Training tests: jitted steps, loss decrease, checkpoint round-trips,
partial warm-start, explosion guard plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voicesplit_tpu.config import Config
from voicesplit_tpu.data import BatchIterator, SeparationDataset, build_synthetic_dataset, discover_samples
from voicesplit_tpu.data.dataset import IteratorState
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import (
    TrainState,
    create_train_state,
    latest_checkpoint,
    load_checkpoint,
    make_eval_step,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)
from voicesplit_tpu.train.checkpoint import (
    config_from_checkpoint,
    partial_restore,
    restore_train_state,
)

SR = 16000


def _small_config(loss="power_law_compression", audio_len=0.6) -> Config:
    """Tiny model/clip so CPU tests stay fast; same topology."""
    c = Config()
    c.model_name = "voicefilter"
    c.loss.loss_name = loss
    c.audio.audio_len = audio_len
    c.model.lstm_dim = 32
    c.model.fc1_dim = 48
    c.model.conv_channels = 8
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.learning_rate = 1e-3
    c.train_config.compute_dtype = "float32"
    return c


def _batch(c: Config, ap: AudioProcessor, seed=0):
    rng = np.random.default_rng(seed)
    B = c.train_config.batch_size
    L = int(SR * c.audio.audio_len)
    t = np.arange(L) / SR
    target = 0.1 * np.sin(2 * np.pi * 220 * t)[None, :] * np.ones((B, 1))
    intf = 0.1 * np.sin(2 * np.pi * 600 * t)[None, :] * np.ones((B, 1))
    return {
        "emb": rng.standard_normal((B, 256)).astype(np.float32),
        "target_wav": target.astype(np.float32),
        "mixed_wav": (target + intf).astype(np.float32),
        "wav_len": np.full((B,), L, np.int32),
        "seq_len": np.full((B,), 1 + L // ap.hop_length, np.int32),
    }


@pytest.fixture(scope="module", params=["power_law_compression", "si_snr"])
def setup(request):
    c = _small_config(loss=request.param)
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    L = int(SR * c.audio.audio_len)
    T = ap.frames_for(L)
    state = create_train_state(c, model, jax.random.PRNGKey(0), (2, T, c.audio.active.num_freq), tx)
    step_fn = make_train_step(c, model, ap, tx, donate=False)
    return c, ap, model, state, step_fn


def test_train_step_runs_and_loss_decreases(setup):
    c, ap, model, state, step_fn = setup
    batch = _batch(c, ap)
    losses = []
    for _ in range(12):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert not bool(jax.device_get(metrics)["loss_exploded"])
    assert int(jax.device_get(state.step)) == 12


def test_eval_step(setup):
    c, ap, model, state, step_fn = setup
    eval_fn = make_eval_step(c, model, ap)
    batch = _batch(c, ap)
    out = jax.device_get(eval_fn(state.params, state.batch_stats, batch))
    assert np.isfinite(out["loss"])
    assert out["si_snr"].shape == (2,)
    assert out["mask"].shape == out["mixed_spec"].shape


def test_checkpoint_roundtrip(tmp_path, setup):
    c, ap, model, state, step_fn = setup
    batch = _batch(c, ap)
    state, _ = step_fn(state, batch)
    data_state = IteratorState(epoch=1, position=3, seed=42)
    path = save_checkpoint(str(tmp_path), state, c, data_state)
    assert latest_checkpoint(str(tmp_path)) == path

    payload = load_checkpoint(path)
    assert payload["step"] == int(jax.device_get(state.step))
    restored, ds = restore_train_state(payload, state)
    assert ds.epoch == 1 and ds.position == 3
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # config recoverable from checkpoint (reference test.py:87-89)
    assert config_from_checkpoint(path).loss.loss_name == c.loss.loss_name


def test_checkpoint_keep_prunes(tmp_path, setup):
    c, ap, model, state, step_fn = setup
    batch = _batch(c, ap)
    for _ in range(3):
        state, _ = step_fn(state, batch)
        save_checkpoint(str(tmp_path), state, c, keep=2)
    from voicesplit_tpu.train.checkpoint import list_checkpoints

    assert len(list_checkpoints(str(tmp_path))) == 2


def test_partial_restore_warm_start(setup):
    """Warm-start semantics: matching shapes copied, mismatches kept fresh,
    reinit_layers skipped (reference set_init_dict)."""
    c, ap, model, state, step_fn = setup
    # a 'wider' model: different lstm → shape mismatch there, conv matches
    c2 = _small_config(loss=c.loss.loss_name)
    c2.model.lstm_dim = 64
    model2 = make_masknet(c2)
    L = int(SR * c2.audio.audio_len)
    T = ap.frames_for(L)
    state2 = create_train_state(c2, model2, jax.random.PRNGKey(1), (2, T, 601), make_optimizer(c2))

    loaded = jax.device_get(
        __import__("flax").serialization.to_state_dict(state.params)
    )
    merged = partial_restore(state2.params, loaded)
    # conv params copied from checkpoint
    a = jax.tree.leaves(merged["conv1"])[0]
    b = jax.tree.leaves(state.params["conv1"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # lstm kept at fresh init (mismatched width)
    a = np.asarray(merged["lstm"]["fwd_w_hh"])
    assert a.shape == (64, 256)
    # reinit_layers forces fresh even on matching shapes
    merged2 = partial_restore(state2.params, loaded, reinit_layers=["conv1"])
    a2 = jax.tree.leaves(merged2["conv1"])[0]
    fresh = jax.tree.leaves(state2.params["conv1"])[0]
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(fresh))


def test_explosion_guard_flags_nan(setup):
    c, ap, model, state, step_fn = setup
    batch = _batch(c, ap)
    batch["mixed_wav"] = np.full_like(batch["mixed_wav"], np.nan)
    _, metrics = step_fn(state, batch)
    assert bool(jax.device_get(metrics)["loss_exploded"])


@pytest.mark.parametrize("backend", ["wavernn", "waveglow"])
def test_train_step_alternative_backends(backend, tmp_path):
    """The full jitted train step works through the same facade with the
    alternative audio backends (reference's 3-backend capability —
    `utils/audio_processor.py:19-59`), not just voicefilter."""
    from voicesplit_tpu.data import BatchIterator, SeparationDataset, build_synthetic_dataset, discover_samples

    c = Config()
    c.audio.backend = backend
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.5
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    ap = AudioProcessor(c.audio)
    c.model.fc2_dim = ap.num_freq  # mask width follows the backend

    d = str(tmp_path / "data")
    build_synthetic_dataset(d, 2, ap.sample_rate, c.audio.audio_len, seed=0)
    ds = SeparationDataset(discover_samples(d, c.dataset.format), ap, c.audio.audio_len)
    loader = BatchIterator(ds, 2, shuffle=False)
    model = make_masknet(c)
    tx = make_optimizer(c)
    state = create_train_state(
        c, model, jax.random.PRNGKey(0), (2, ds.n_frames, ap.num_freq), tx
    )
    step = make_train_step(c, model, ap, tx, donate=False)
    state, metrics = step(state, next(loader))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)


def test_multi_step_dispatch_matches_sequential_steps():
    """K scanned steps == K sequential jitted steps (state + metrics)."""
    import numpy as np
    from voicesplit_tpu.config import Config
    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train import create_train_state, make_optimizer
    from voicesplit_tpu.train.steps import make_multi_train_step, make_train_step

    c = Config()
    c.audio.active.num_freq = 33
    c.audio.active.n_fft = 64
    c.audio.active.hop_length = 16
    c.audio.active.win_length = 32
    c.audio.audio_len = 0.05
    c.model.lstm_dim = 8
    c.model.fc1_dim = 8
    c.model.fc2_dim = 33
    c.train_config.batch_size = 2
    # fp32 compute: scan vs separate jits fuse differently, and bf16
    # rounding would diverge over steps at the reference lr
    c.train_config.compute_dtype = "float32"
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    B, K = 2, 3
    L = int(ap.sample_rate * c.audio.audio_len)
    T = ap.frames_for(L)
    rng = np.random.default_rng(0)
    state0 = create_train_state(c, model, jax.random.PRNGKey(0), (B, T, ap.num_freq), tx)

    def mkbatch(i):
        r = np.random.default_rng(i)
        return {
            "emb": r.standard_normal((B, 256)).astype(np.float32),
            "target_wav": (0.1 * r.standard_normal((B, L))).astype(np.float32),
            "mixed_wav": (0.1 * r.standard_normal((B, L))).astype(np.float32),
            "wav_len": np.full((B,), L, np.int32),
            "seq_len": np.full((B,), T, np.int32),
        }

    batches = [mkbatch(i) for i in range(K)]
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches]) for k in batches[0]}

    single = make_train_step(c, model, ap, tx, donate=False)
    st = state0
    for b in batches:
        st, m_seq = single(st, b)

    multi = make_multi_train_step(c, model, ap, tx, K, donate=False)
    st_multi, m_multi = multi(state0, stacked)

    assert int(st_multi.step) == int(st.step) == K
    np.testing.assert_allclose(
        np.asarray(m_multi["loss"]), np.asarray(m_seq["loss"]), rtol=1e-5
    )
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(st.params),
        jax.tree_util.tree_leaves_with_path(st_multi.params),
    ):
        name = jax.tree_util.keystr(p)
        if "Conv_0" in name and "bias" in name:
            # conv-bias grads are analytically zero through batch-stat
            # BN; Adam turns each path's float summation noise into an
            # independent +-lr random walk (true of the torch reference
            # too) — only the walk magnitude is checkable
            assert float(np.max(np.abs(np.asarray(b)))) < 5 * K * 1e-2
            continue
        # Adam's rsqrt(v) makes early updates ~lr*sign(g): float-noise
        # sign flips on near-zero grad components bound the achievable
        # agreement to a small per-step drift, not exact equality
        scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-2 * scale,
            err_msg=name,
        )


def test_async_checkpointer_matches_sync(tmp_path, setup):
    """AsyncCheckpointer writes byte-identical payloads to save_checkpoint,
    one write in flight at a time, and wait() flushes before exit."""
    from voicesplit_tpu.train.checkpoint import AsyncCheckpointer

    c, ap, model, state, step_fn = setup
    batch = _batch(c, ap)
    state, _ = step_fn(state, batch)
    data_state = IteratorState(epoch=2, position=5, seed=3)

    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    p_sync = save_checkpoint(sync_dir, state, c, data_state)
    w = AsyncCheckpointer()
    p_async = w.save(async_dir, state, c, data_state)
    w.wait()
    with open(p_sync, "rb") as f_a, open(p_async, "rb") as f_b:
        assert f_a.read() == f_b.read()

    # back-to-back saves serialize (one in flight); keep-pruning applies
    for _ in range(3):
        state, _ = step_fn(state, batch)
        w.save(async_dir, state, c, keep=2)
    w.wait()
    from voicesplit_tpu.train.checkpoint import list_checkpoints

    assert len(list_checkpoints(async_dir)) == 2
    # post-wait, the latest checkpoint restores
    payload = load_checkpoint(latest_checkpoint(async_dir))
    restore_train_state(payload, state)


def test_async_checkpointer_surfaces_write_errors(tmp_path, setup):
    from voicesplit_tpu.train.checkpoint import AsyncCheckpointer

    import os

    import jax

    from voicesplit_tpu.train.checkpoint import CKPT_PATTERN

    c, ap, model, state, step_fn = setup
    import pytest as _pytest

    # Synchronous failure path: log_dir is a file, save()'s makedirs
    # raises in the caller before any worker thread starts.
    bad_dir = str(tmp_path / "file_not_dir")
    with open(bad_dir, "w") as f:
        f.write("x")
    w = AsyncCheckpointer()
    with _pytest.raises(OSError):
        w.save(bad_dir, state, c)

    # Asynchronous failure path: makedirs succeeds but the WORKER's
    # tmp-file write fails (the .tmp path is pre-created as a
    # directory), so the error can only surface via wait()'s
    # worker-thread-failure -> RuntimeError re-raise.
    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    step = int(jax.device_get(state.step))
    os.makedirs(os.path.join(log_dir, (CKPT_PATTERN % step) + ".tmp"))
    w = AsyncCheckpointer()
    w.save(log_dir, state, c)  # must NOT raise here — write is async
    with _pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # the error is consumed: a subsequent wait() is clean
    w.wait()
