"""GE2E speaker-encoder training loop (importable core).

`cli/train_encoder.py` is the thin CLI over this; `scripts/demo_train.py
--emb ge2e` uses it to train an encoder on the demo corpus before the
separation run, demonstrating the full reference pipeline — encoder
training → d-vector extraction → conditioned separation — entirely
in-framework (the reference's encoder was an external artifact,
SURVEY.md §2 "GE2E speaker encoder").
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple


class MelSampler:
    """Host-side batch sampler: N speakers x M random 80-frame mel crops.

    Mels are computed once per file and cached (40 mels x ~300 frames
    per 3 s utterance ≈ 50 kB — thousands of utterances fit in RAM).
    """

    def __init__(self, ap, speakers: Dict[str, List[str]], window: int, rng):
        self.ap = ap
        self.speakers = speakers
        self.names = sorted(speakers)
        self.window = window
        self.rng = rng
        self._cache: Dict[str, "object"] = {}

    def _mel(self, path: str):
        m = self._cache.get(path)
        if m is None:
            import numpy as np

            wav = self.ap.load_wav(path)
            # bucketed: one compiled mel program per 1 s length bucket
            # instead of one per distinct utterance length
            m = np.asarray(self.ap.get_mel_bucketed(wav), np.float32)
            self._cache[path] = m
        return m

    def crop(self, path: str):
        import numpy as np

        m = self._mel(path)
        T = m.shape[1]
        if T < self.window:
            m = np.pad(m, ((0, 0), (0, self.window - T)), mode="wrap")
            return m[:, : self.window]
        s = int(self.rng.integers(0, T - self.window + 1))
        return m[:, s : s + self.window]

    def batch(self, n_speakers: int, m_utts: int, names: Optional[List[str]] = None):
        import numpy as np

        pool = names if names is not None else self.names
        chosen = self.rng.choice(len(pool), size=n_speakers, replace=False)
        mels, ids = [], []
        for ci in chosen:
            name = pool[int(ci)]
            wavs = self.speakers[name]
            replace = len(wavs) < m_utts
            picks = self.rng.choice(len(wavs), size=m_utts, replace=replace)
            for pi in picks:
                mels.append(self.crop(wavs[int(pi)]))
                ids.append(name)
        return np.stack(mels), ids  # [N*M, n_mels, W]


def train_ge2e(
    ap,
    speakers: Dict[str, List[str]],
    *,
    n_speakers: int = 16,
    m_utts: int = 6,
    steps: int = 2000,
    lr: float = 1e-4,
    lstm_hidden: int = 768,
    lstm_layers: int = 3,
    emb_dim: int = 256,
    seed: int = 0,
    window: int = 80,
    log_interval: int = 50,
    log: Callable[[str], None] = print,
    params=None,
    opt_state=None,
    step0: int = 0,
) -> Tuple["object", Dict, "object", List[float]]:
    """Train the GE2E encoder on a speaker->wavs dict.

    Returns ``(encoder, params, opt_state, losses)``; pass params/
    opt_state/step0 back in to continue training.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voicesplit_tpu.losses.ge2e import ge2e_softmax_loss
    from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder

    N, M = n_speakers, m_utts
    if len(speakers) < N:
        raise ValueError(f"need >= {N} speakers, got {len(speakers)}")
    rng = np.random.default_rng(seed)
    sampler = MelSampler(ap, speakers, window=window, rng=rng)
    n_mels = int(np.asarray(sampler.crop(next(iter(speakers.values()))[0])).shape[0])

    encoder = SpeakerEncoder(
        num_mels=n_mels, lstm_hidden=lstm_hidden,
        lstm_layers=lstm_layers, emb_dim=emb_dim,
    )
    if params is None:
        mel0 = jnp.zeros((N * M, n_mels, window), jnp.float32)
        params = {
            "enc": encoder.init(jax.random.PRNGKey(seed), mel0)["params"],
            "w": jnp.asarray(10.0, jnp.float32),  # paper init (w=10, b=-5)
            "b": jnp.asarray(-5.0, jnp.float32),
        }
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))
    if opt_state is None:
        opt_state = tx.init(params)

    def loss_fn(params, mels):
        emb = encoder.apply({"params": params["enc"]}, mels)  # [N*M, D]
        return ge2e_softmax_loss(emb.reshape(N, M, -1), params["w"], params["b"])

    @jax.jit
    def train_step(params, opt_state, mels):
        loss, grads = jax.value_and_grad(loss_fn)(params, mels)
        # paper: 0.01x smaller gradient scale on (w, b)
        grads = {**grads, "w": grads["w"] * 0.01, "b": grads["b"] * 0.01}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    import time

    losses: List[float] = []
    t0 = time.time()
    for step in range(step0 + 1, step0 + steps + 1):
        mels, _ = sampler.batch(N, M)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(mels))
        if step % log_interval == 0 or step == step0 + 1:
            losses.append(float(loss))
            log(f"ge2e step {step}  loss {float(loss):.4f}  "
                f"({(time.time() - t0) / max(1, step - step0):.2f} s/step)")
    return encoder, params, opt_state, losses


def _embed_apply_fn(encoder):
    """ONE compiled window-batch program per encoder topology.

    Params are a traced ARGUMENT: a fresh ``jax.jit(lambda ...)`` per
    utterance looks free but compiles every call (jit caches on function
    identity) — measured ~10 s/utterance on the tunneled dev chip, which
    turned a 126-utterance enrollment into 15+ silent minutes."""
    import functools

    import jax

    if not hasattr(_embed_apply_fn, "_cache"):
        _embed_apply_fn._cache = functools.lru_cache(maxsize=8)(
            lambda enc: jax.jit(lambda p, m: enc.apply({"params": p}, m))
        )
    return _embed_apply_fn._cache(encoder)


def embed_utterance_windows(encoder, params, ap, wav, batch_windows: int = 32,
                            stride=None):
    """Per-window d-vectors ``[n_win, D]`` of one waveform, each row
    L2-normalized (the encoder's own window/stride semantics;
    fixed-shape compiled batches like the CLI).

    ``stride`` overrides the encoder's sliding stride — EER trial
    generation passes ``stride=encoder.window`` so windows don't
    overlap (overlapping windows of one recording are nearly
    duplicated trials and would overstate the effective n even under a
    per-recording cluster bootstrap)."""
    import jax.numpy as jnp
    import numpy as np

    mel = np.asarray(ap.get_mel_bucketed(wav), np.float32)
    W = encoder.window
    S = encoder.stride if stride is None else int(stride)
    T = mel.shape[1]
    if T < W:
        mel = np.pad(mel, ((0, 0), (0, W - T)), mode="wrap")
        T = W
    n_win = (T - W) // S + 1
    wins = np.stack([mel[:, s * S : s * S + W] for s in range(n_win)])
    fn = _embed_apply_fn(encoder)
    apply_win = lambda m: fn(params["enc"], m)  # noqa: E731
    parts = []
    for i in range(0, n_win, batch_windows):
        chunk = wins[i : i + batch_windows]
        valid = len(chunk)
        if valid < batch_windows:
            chunk = np.concatenate(
                [chunk, np.zeros((batch_windows - valid, *chunk.shape[1:]), np.float32)]
            )
        parts.append(np.asarray(apply_win(jnp.asarray(chunk)))[:valid])
    embs = np.concatenate(parts)
    norms = np.linalg.norm(embs, axis=-1, keepdims=True)
    return (embs / (norms + 1e-8)).astype(np.float32)


def embed_utterance(encoder, params, ap, wav, batch_windows: int = 32):
    """Mean-pooled d-vector of one waveform (the encoder's own window/
    stride semantics; fixed-shape compiled batches like the CLI)."""
    import numpy as np

    emb = embed_utterance_windows(encoder, params, ap, wav,
                                  batch_windows=batch_windows).mean(axis=0)
    return (emb / (np.linalg.norm(emb) + 1e-8)).astype(np.float32)
