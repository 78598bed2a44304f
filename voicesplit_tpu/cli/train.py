"""Training CLI (reference `train.py:140-163`).

    python -m voicesplit_tpu.cli.train -c config.json \
        [--checkpoint_path ckpt.msgpack] [--logs_path dir] \
        [--model_parallel N] [--max_steps N]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a voice-separation model")
    parser.add_argument("-c", "--config_path", type=str, required=True)
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="checkpoint to resume (full) or warm-start (partial)")
    parser.add_argument("--logs_path", type=str, default=None)
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="model-axis size for the wide variant")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--eval_sdr", action="store_true",
                        help="compute host-side SDR during eval (slower)")
    parser.add_argument("--online", action="store_true",
                        help="mix 2-speaker training batches on the fly from a "
                             "speaker-per-directory corpus at dataset.train_dir "
                             "instead of reading pre-mixed triplets")
    parser.add_argument("--emb_mode", choices=["pseudo", "spectral"], default="pseudo",
                        help="--online fallback for speakers without precomputed "
                        "embeddings: pseudo = identity tokens (smoke mode), "
                        "spectral = training-free signal-derived d-vectors "
                        "(the open-set protocol)")
    parser.add_argument("--embeddings_dir", type=str, default=None,
                        help="with --online: <speaker>.npy d-vectors")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: coordinator address host:port")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multi-host: total number of host processes")
    parser.add_argument("--process_id", type=int, default=None,
                        help="multi-host: this host's process index")
    parser.add_argument("--debug_nans", action="store_true",
                        help="NaN-triage mode: check the explosion guard every "
                             "step, keep the pre-step state, and on explosion "
                             "re-run the failing step unjitted under "
                             "jax_debug_nans to name the first NaN-producing op")
    args = parser.parse_args(argv)

    if args.num_processes and args.num_processes > 1:
        from voicesplit_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    from voicesplit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from voicesplit_tpu.config import load_config
    from voicesplit_tpu.train.trainer import Trainer

    config = load_config(args.config_path)
    if args.logs_path:
        config.train_config.logs_path = args.logs_path
    os.makedirs(config.train_config.logs_path, exist_ok=True)

    # keep a copy of the config next to the checkpoints (reference
    # copy_config_file behavior, utils/generic_utils.py:583-594)
    with open(os.path.join(config.train_config.logs_path, "config.json"), "w") as f:
        f.write(config.to_json())

    train_loader = None
    if args.online:
        import jax

        from voicesplit_tpu.data.online import OnlineMixIterator, discover_utterances

        speakers = discover_utterances(config.dataset.train_dir)
        embeddings = None
        if args.embeddings_dir:
            from glob import glob as _glob

            embeddings = {
                os.path.splitext(os.path.basename(p))[0]: p
                for p in _glob(os.path.join(args.embeddings_dir, "*.npy"))
            }
        ap_cfg = config.audio.active
        train_loader = OnlineMixIterator(
            speakers,
            config.train_config.batch_size,
            sample_rate=ap_cfg.sample_rate,
            audio_len=config.audio.audio_len,
            hop_length=ap_cfg.hop_length,
            emb_dim=config.model.emb_dim,
            embeddings=embeddings,
            emb_mode=args.emb_mode,
            seed=config.train_config.seed,
            shard_id=jax.process_index(),
            num_shards=max(1, jax.process_count()),
        )

    trainer = Trainer(
        config,
        checkpoint_path=args.checkpoint_path,
        model_parallel=args.model_parallel,
        train_loader=train_loader,
        debug_nans=args.debug_nans,
    )
    result = trainer.fit(max_steps=args.max_steps, compute_sdr_in_eval=args.eval_sdr)
    print(f"done: {result}")


if __name__ == "__main__":
    main()
