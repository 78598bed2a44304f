"""GE2E speaker-encoder training CLI.

The reference's d-vector encoder is a PRETRAINED external artifact
(``embedder.pt``); its training never lived in the repo.  This CLI
closes that gap: it trains the same `SpeakerEncoder` topology with the
GE2E softmax loss (`losses/ge2e.py`) on a ``root/<speaker>/*.wav`` tree
(the layout `cli/resample.py` produces from LibriSpeech/VCTK), so the
whole VoiceFilter pipeline — encoder included — is reproducible inside
this framework.

    python -m voicesplit_tpu.cli.train_encoder --data_root DIR \
        [--speakers_per_batch 16] [--utts_per_speaker 6] \
        [--steps 100000] [--lr 1e-4] [--output_path logs/encoder] \
        [-c config.json] [--eval_interval 500] [--holdout_speakers 4]

Training protocol per arXiv:1710.10467: each step samples N speakers x
M utterances, crops a random 80-mel-frame window from each, embeds all
N*M windows in one jitted step, and minimizes the GE2E softmax loss
with learnable (w, b) (w-positive, grads on w/b scaled by 0.01 as in
the paper) under global-norm-3 clipping.  Progress metric: pairwise
cosine EER on held-out speakers.  Checkpoints are flax msgpack
(`--resume` to continue; `cli/extract_embeddings.py` loads them
directly via --encoder_checkpoint foo.msgpack).
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob


def _discover_speakers(root: str, min_utts: int):
    speakers = {}
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d)
        if not os.path.isdir(p):
            continue
        wavs = sorted(glob(os.path.join(p, "**", "*.wav"), recursive=True))
        if len(wavs) >= min_utts:
            speakers[d] = wavs
    return speakers


class _MelSampler:
    """Host-side batch sampler: N speakers x M random 80-frame mel crops.

    Mels are computed once per file and cached (40 mels x ~300 frames
    per 3 s utterance ≈ 50 kB — thousands of utterances fit in RAM).
    """

    def __init__(self, ap, speakers, window: int, rng):
        self.ap = ap
        self.speakers = speakers
        self.names = sorted(speakers)
        self.window = window
        self.rng = rng
        self._cache = {}

    def _mel(self, path):
        m = self._cache.get(path)
        if m is None:
            import numpy as np

            wav = self.ap.load_wav(path)
            m = np.asarray(self.ap.get_mel(wav), np.float32)  # [n_mels, T]
            self._cache[path] = m
        return m

    def crop(self, path):
        import numpy as np

        m = self._mel(path)
        T = m.shape[1]
        if T < self.window:
            m = np.pad(m, ((0, 0), (0, self.window - T)), mode="wrap")
            return m[:, : self.window]
        s = int(self.rng.integers(0, T - self.window + 1))
        return m[:, s : s + self.window]

    def batch(self, n_speakers: int, m_utts: int, names=None):
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


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the GE2E speaker encoder")
    parser.add_argument("--data_root", type=str, required=True,
                        help="root/<speaker>/*.wav tree")
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--speakers_per_batch", type=int, default=16)
    parser.add_argument("--utts_per_speaker", type=int, default=6)
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--output_path", type=str, default="logs/encoder")
    parser.add_argument("--checkpoint_interval", type=int, default=1000)
    parser.add_argument("--eval_interval", type=int, default=500)
    parser.add_argument("--log_interval", type=int, default=50)
    parser.add_argument("--holdout_speakers", type=int, default=4,
                        help="speakers reserved for the EER metric (0 = eval on train speakers)")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    # small-topology overrides (tests / quick experiments)
    parser.add_argument("--lstm_hidden", type=int, default=768)
    parser.add_argument("--lstm_layers", type=int, default=3)
    args = parser.parse_args(argv)

    from voicesplit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from voicesplit_tpu.config import Config, load_config
    from voicesplit_tpu.dsp.processor import make_audio_processor
    from voicesplit_tpu.losses.ge2e import ge2e_softmax_loss, pairwise_eer
    from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder

    config = load_config(args.config_path) if args.config_path else Config()
    ap = make_audio_processor(config)
    N, M = args.speakers_per_batch, args.utts_per_speaker

    speakers = _discover_speakers(args.data_root, min_utts=2)
    if len(speakers) < N + args.holdout_speakers:
        raise SystemExit(
            f"need >= {N + args.holdout_speakers} speakers with >=2 utts, "
            f"found {len(speakers)} under {args.data_root}"
        )
    rng = np.random.default_rng(args.seed)
    sampler = _MelSampler(ap, speakers, window=80, rng=rng)
    names = sampler.names
    holdout = names[: args.holdout_speakers]
    train_names = names[args.holdout_speakers :] if args.holdout_speakers else names

    encoder = SpeakerEncoder(
        num_mels=config.audio.active.num_mels,
        lstm_hidden=args.lstm_hidden,
        lstm_layers=args.lstm_layers,
        emb_dim=config.model.emb_dim,
    )
    mel0 = jnp.zeros((N * M, config.audio.active.num_mels, 80), jnp.float32)
    params = {
        "enc": encoder.init(jax.random.PRNGKey(args.seed), mel0)["params"],
        # paper init: w=10, b=-5
        "w": jnp.asarray(10.0, jnp.float32),
        "b": jnp.asarray(-5.0, jnp.float32),
    }
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(args.lr))
    opt_state = tx.init(params)
    step0 = 0
    if args.resume:
        with open(args.resume, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        params = serialization.from_state_dict(params, blob["params"])
        opt_state = serialization.from_state_dict(opt_state, blob["opt_state"])
        step0 = int(blob["step"])
        print(f" > resumed {args.resume} at step {step0}")

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

    embed = jax.jit(lambda params, mels: encoder.apply({"params": params["enc"]}, mels))

    def eval_eer(params):
        pool = holdout if holdout else train_names
        n = min(len(pool), 8)
        mels, ids = sampler.batch(n, 4, names=pool)
        emb = np.asarray(embed(params, jnp.asarray(mels)))
        return pairwise_eer(emb, ids)

    os.makedirs(args.output_path, exist_ok=True)
    t0 = time.time()
    for step in range(step0 + 1, args.steps + 1):
        mels, _ = sampler.batch(N, M, names=train_names)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(mels))
        if step % args.log_interval == 0 or step == step0 + 1:
            print(f"step {step}  loss {float(loss):.4f}  "
                  f"({(time.time() - t0) / max(1, step - step0):.2f} s/step)", flush=True)
        if args.eval_interval and step % args.eval_interval == 0:
            print(f"step {step}  holdout pairwise EER {eval_eer(params):.3f}", flush=True)
        if step % args.checkpoint_interval == 0 or step == args.steps:
            blob = {
                "params": serialization.to_state_dict(params),
                "opt_state": serialization.to_state_dict(opt_state),
                "step": step,
                "encoder": {
                    "num_mels": config.audio.active.num_mels,
                    "lstm_hidden": args.lstm_hidden,
                    "lstm_layers": args.lstm_layers,
                    "emb_dim": config.model.emb_dim,
                },
            }
            path = os.path.join(args.output_path, f"encoder_{step}.msgpack")
            with open(path, "wb") as f:
                f.write(serialization.msgpack_serialize(blob))
            print(f" > saved {path}", flush=True)


if __name__ == "__main__":
    main()
