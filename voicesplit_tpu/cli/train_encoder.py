"""GE2E speaker-encoder training CLI.

The reference's d-vector encoder is a PRETRAINED external artifact
(``embedder.pt``); its training never lived in the repo.  This CLI
closes that gap: it trains the same `SpeakerEncoder` topology with the
GE2E softmax loss (`losses/ge2e.py`) on a ``root/<speaker>/*.wav`` tree
(the layout `cli/resample.py` produces from LibriSpeech/VCTK), so the
whole VoiceFilter pipeline — encoder included — is reproducible inside
this framework.  The training core lives in `train/encoder.py`.

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
    from flax import serialization

    from voicesplit_tpu.config import Config, load_config
    from voicesplit_tpu.dsp.processor import make_audio_processor
    from voicesplit_tpu.losses.ge2e import pairwise_eer
    from voicesplit_tpu.train.encoder import MelSampler, train_ge2e

    config = load_config(args.config_path) if args.config_path else Config()
    ap = make_audio_processor(config)
    N, M = args.speakers_per_batch, args.utts_per_speaker

    speakers = _discover_speakers(args.data_root, min_utts=2)
    if len(speakers) < N + args.holdout_speakers:
        raise SystemExit(
            f"need >= {N + args.holdout_speakers} speakers with >=2 utts, "
            f"found {len(speakers)} under {args.data_root}"
        )
    names = sorted(speakers)
    holdout = names[: args.holdout_speakers]
    train_speakers = {
        k: v for k, v in speakers.items()
        if k not in set(holdout)
    } if args.holdout_speakers else speakers

    params = opt_state = None
    step0 = 0
    if args.resume:
        import optax

        from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder

        with open(args.resume, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        enc_t = SpeakerEncoder(
            num_mels=config.audio.active.num_mels,
            lstm_hidden=args.lstm_hidden, lstm_layers=args.lstm_layers,
            emb_dim=config.model.emb_dim,
        )
        mel0 = jnp.zeros((N * M, config.audio.active.num_mels, 80), jnp.float32)
        params = {
            "enc": enc_t.init(jax.random.PRNGKey(args.seed), mel0)["params"],
            "w": jnp.asarray(10.0, jnp.float32),
            "b": jnp.asarray(-5.0, jnp.float32),
        }
        tx_t = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(args.lr))
        opt_state = tx_t.init(params)
        params = serialization.from_state_dict(params, blob["params"])
        opt_state = serialization.from_state_dict(opt_state, blob["opt_state"])
        step0 = int(blob["step"])
        print(f" > resumed {args.resume} at step {step0}")

    eval_rng = np.random.default_rng(args.seed + 1)
    eval_sampler = MelSampler(ap, speakers, window=80, rng=eval_rng)

    encoder = None

    def eval_eer(encoder, params):
        pool = holdout if holdout else names
        n = min(len(pool), 8)
        mels, ids = eval_sampler.batch(n, 4, names=pool)
        emb = np.asarray(
            jax.jit(lambda m: encoder.apply({"params": params["enc"]}, m))(
                jnp.asarray(mels)
            )
        )
        return pairwise_eer(emb, ids)

    def save(params, opt_state, step):
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

    os.makedirs(args.output_path, exist_ok=True)
    chunk = min(
        x for x in (args.eval_interval or args.steps,
                    args.checkpoint_interval, args.steps) if x > 0
    )
    step = step0
    while step < args.steps:
        n_now = min(chunk, args.steps - step)
        encoder, params, opt_state, _ = train_ge2e(
            ap, train_speakers,
            n_speakers=N, m_utts=M, steps=n_now, lr=args.lr,
            lstm_hidden=args.lstm_hidden, lstm_layers=args.lstm_layers,
            emb_dim=config.model.emb_dim, seed=args.seed + step,
            log_interval=args.log_interval,
            params=params, opt_state=opt_state, step0=step,
        )
        step += n_now
        if args.eval_interval and step % args.eval_interval == 0:
            print(f"step {step}  holdout pairwise EER {eval_eer(encoder, params):.3f}",
                  flush=True)
        if step % args.checkpoint_interval == 0 or step >= args.steps:
            save(params, opt_state, step)


if __name__ == "__main__":
    main()
