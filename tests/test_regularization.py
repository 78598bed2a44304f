"""Mask-net regularization levers (round-3 VERDICT item 2): SpecAugment
input masking, dropout, and AdamW weight decay.  All default OFF —
reference parity — and every test pins that the defaults change nothing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.augment import spec_time_freq_mask
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step
from voicesplit_tpu.train.state import _decay_mask


def tiny_config(**kw):
    c = Config()
    c.model.lstm_dim = 16
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.model.emb_dim = 8
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    for k, v in kw.items():
        obj = c.train_config if hasattr(c.train_config, k) else c.model
        setattr(obj, k, v)
    return c


# ------------------------------------------------------------ spec masking


def test_spec_mask_shapes_and_zeroing():
    spec = jnp.ones((3, 40, 20))
    out = spec_time_freq_mask(spec, jax.random.PRNGKey(0), max_time=8,
                              max_freq=6, n_masks=2)
    assert out.shape == spec.shape
    out = np.asarray(out)
    assert ((out == 0) | (out == 1)).all()  # pure zero-fill masking
    assert (out == 0).any()  # something was masked at these widths
    # masked time bands are full columns: a zeroed (b, t) row is zero
    # across ALL F unless a freq mask also hits — column structure means
    # per-(b,t) the row is either untouched, partially freq-masked, or 0
    frac = (out == 0).mean()
    assert frac < 0.9  # not wiping the whole spec


def test_spec_mask_noop_when_disabled():
    spec = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 12)))
    out = spec_time_freq_mask(spec, jax.random.PRNGKey(1), 0, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))


def test_spec_mask_deterministic_per_key():
    spec = jnp.ones((2, 30, 16))
    a = spec_time_freq_mask(spec, jax.random.PRNGKey(7), 5, 4)
    b = spec_time_freq_mask(spec, jax.random.PRNGKey(7), 5, 4)
    c = spec_time_freq_mask(spec, jax.random.PRNGKey(8), 5, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_spec_mask_independent_per_item():
    spec = jnp.ones((8, 50, 1))
    out = np.asarray(spec_time_freq_mask(spec, jax.random.PRNGKey(3),
                                         max_time=20, n_masks=1))[:, :, 0]
    patterns = {tuple(row.astype(int)) for row in out}
    assert len(patterns) > 1  # items get different masks


# ----------------------------------------------------------------- dropout


def test_dropout_eval_identity_and_train_stochastic():
    c = tiny_config(dropout=0.3)
    model = make_masknet(c)
    B, T, F = 2, 12, c.audio.active.num_freq
    spec = jnp.abs(jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T, F)).astype(np.float32)))
    emb = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, c.model.emb_dim)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), spec, emb)

    c0 = tiny_config()  # dropout 0, same seed -> identical params
    model0 = make_masknet(c0)
    v0 = model0.init(jax.random.PRNGKey(0), spec, emb)
    chex = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.allclose(a, b)), variables["params"], v0["params"]))
    assert chex

    # eval: dropout layer is identity -> same mask as the dropout-0 model
    m_eval = model.apply(variables, spec, emb, train=False)
    m0_eval = model0.apply(v0, spec, emb, train=False)
    np.testing.assert_allclose(np.asarray(m_eval), np.asarray(m0_eval),
                               atol=1e-6)

    # train: stochastic across rng keys
    def train_mask(key):
        out, _ = model.apply(variables, spec, emb, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key})
        return np.asarray(out)

    a = train_mask(jax.random.PRNGKey(1))
    b = train_mask(jax.random.PRNGKey(2))
    assert not np.allclose(a, b)


def test_dropout_zero_needs_no_rng_in_train():
    c = tiny_config()
    model = make_masknet(c)
    B, T, F = 2, 8, c.audio.active.num_freq
    spec = jnp.ones((B, T, F))
    emb = jnp.ones((B, c.model.emb_dim))
    variables = model.init(jax.random.PRNGKey(0), spec, emb)
    out, _ = model.apply(variables, spec, emb, train=True,
                         mutable=["batch_stats"])  # no rngs: must not raise
    assert np.isfinite(np.asarray(out)).all()


# ----------------------------------------------------- optimizer / step


def test_decay_mask_excludes_vectors():
    params = {
        "conv1": {"Conv_0": {"kernel": np.zeros((3, 3, 1, 4)),
                             "bias": np.zeros(4)},
                  "BatchNorm_0": {"scale": np.zeros(4), "bias": np.zeros(4)}},
        "lstm": {"fwd_w_ih": np.zeros((4, 8)), "fwd_b": np.zeros(8)},
        "fc1": {"kernel": np.zeros((4, 4)), "bias": np.zeros(4)},
    }
    m = _decay_mask(params)
    assert m["conv1"]["Conv_0"]["kernel"] is True
    assert m["conv1"]["Conv_0"]["bias"] is False
    assert m["conv1"]["BatchNorm_0"]["scale"] is False
    assert m["lstm"]["fwd_w_ih"] is True
    assert m["lstm"]["fwd_b"] is False
    assert m["fc1"]["kernel"] is True


@pytest.mark.parametrize("levers", [
    {"weight_decay": 1e-3},
    {"spec_aug_time": 6, "spec_aug_freq": 8},
    {"dropout": 0.2},
    {"weight_decay": 1e-3, "spec_aug_time": 6, "spec_aug_freq": 8,
     "dropout": 0.2},
])
def test_train_step_runs_with_levers(levers):
    c = tiny_config(**levers)
    c.audio.audio_len = 0.4
    ap = AudioProcessor(c.audio)
    model = make_masknet(c)
    tx = make_optimizer(c)
    B = 2
    L = int(ap.sample_rate * c.audio.audio_len)
    T = ap.frames_for(L)
    state = create_train_state(c, model, jax.random.PRNGKey(0),
                               (B, T, ap.num_freq), tx)
    step = make_train_step(c, model, ap, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "mixed_wav": jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)),
        "target_wav": jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)),
        "emb": jnp.asarray(rng.normal(size=(B, c.model.emb_dim)).astype(np.float32)),
        "wav_len": jnp.full((B,), L, jnp.int32),
    }
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m1["grad_norm"]) > 0
    assert int(s2.step) == 2


def test_weight_decay_shrinks_kernels_vs_adam():
    # identical grads, lr tiny: with decay the fc kernels end smaller
    c_wd = tiny_config(weight_decay=0.1, learning_rate=1e-4)
    c_ad = tiny_config(learning_rate=1e-4)
    c_wd.audio.audio_len = 0.4
    c_ad.audio.audio_len = 0.4
    ap = AudioProcessor(c_wd.audio)
    B = 2
    L = int(ap.sample_rate * 0.4)
    T = ap.frames_for(L)
    rng = np.random.default_rng(1)
    batch = {
        "mixed_wav": jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)),
        "target_wav": jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)),
        "emb": jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
        "wav_len": jnp.full((B,), L, jnp.int32),
    }

    def norms_after(c, n=3):
        model = make_masknet(c)
        tx = make_optimizer(c)
        state = create_train_state(c, model, jax.random.PRNGKey(0),
                                   (B, T, ap.num_freq), tx)
        step = make_train_step(c, model, ap, tx, donate=False)
        for _ in range(n):
            state, _ = step(state, batch)
        return float(jnp.linalg.norm(state.params["fc1"]["kernel"]))

    assert norms_after(c_wd) < norms_after(c_ad)


# ------------------------------------------------------------------- EMA


def test_ema_update_math_and_identity():
    from voicesplit_tpu.train import make_ema_update

    upd = make_ema_update(0.9)
    ema = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    params = {"w": jnp.full((3,), 2.0), "b": jnp.full((2,), 10.0)}
    out = upd(ema, params)
    np.testing.assert_allclose(out["w"], 0.9 * 1.0 + 0.1 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(out["b"], 0.1 * 10.0, rtol=1e-6)
    # fixed point: averaging a constant trajectory is the identity
    same = upd(params, params)
    np.testing.assert_allclose(same["w"], params["w"], rtol=1e-7)


def test_ema_converges_to_constant_params():
    from voicesplit_tpu.train import make_ema_update

    upd = make_ema_update(0.5)
    ema = {"w": jnp.zeros(())}
    params = {"w": jnp.asarray(8.0)}
    for _ in range(20):
        ema = upd(ema, params)
    np.testing.assert_allclose(float(ema["w"]), 8.0, atol=1e-4)
