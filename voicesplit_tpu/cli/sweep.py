"""Checkpoint-sweep CLI (reference `test_all_checkpoints.py` /
`test_fast_all_checkpoints.py`).

    python -m voicesplit_tpu.cli.sweep --checkpoints_path dir \
        [-c config.json] [--fast] [--test_dir dir]

Evaluates every ``checkpoint_*.msgpack``, copies
``[fast_]best_checkpoint.msgpack`` and saves the metric curve.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="Sweep all checkpoints")
    parser.add_argument("--checkpoints_path", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--test_dir", type=str, default=None)
    parser.add_argument("--fast", action="store_true",
                        help="batched SI-SNR only (no host-side SDR)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--max_items", type=int, default=None)
    parser.add_argument(
        "--sdr_backend", choices=["auto", "host", "device"], default="auto",
        help="host = per-item float64 projection; device = batched on-chip",
    )
    args = parser.parse_args(argv)

    from voicesplit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from voicesplit_tpu.config import load_config
    from voicesplit_tpu.data.dataset import test_dataloader
    from voicesplit_tpu.dsp.processor import make_audio_processor
    from voicesplit_tpu.eval.sweep import sweep_checkpoints
    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train.checkpoint import config_from_checkpoint, list_checkpoints
    from voicesplit_tpu.train.state import create_train_state, make_optimizer
    from voicesplit_tpu.train.steps import make_eval_step

    ckpts = list_checkpoints(args.checkpoints_path)
    if not ckpts:
        raise SystemExit(f"no checkpoints in {args.checkpoints_path}")
    config = (
        load_config(args.config_path)
        if args.config_path
        else config_from_checkpoint(ckpts[-1])
    )
    if args.test_dir:
        config.dataset.test_dir = args.test_dir
    from voicesplit_tpu.eval.validation import _default_sdr_backend

    sdr_backend = args.sdr_backend
    if sdr_backend == "auto":
        sdr_backend = _default_sdr_backend()
    if args.batch_size:
        config.test_config.batch_size = args.batch_size
    elif args.fast:
        config.test_config.batch_size = 5  # reference fast sweep default
    elif sdr_backend == "device":
        config.test_config.batch_size = 8  # SDR is batched on-chip too
    else:
        config.test_config.batch_size = 1  # reference full sweep forces bs=1

    ap = make_audio_processor(config)
    model = make_masknet(config)
    loader = test_dataloader(config, ap)
    template = create_train_state(
        config, model, jax.random.PRNGKey(0),
        (config.test_config.batch_size, loader.dataset.n_frames, ap.num_freq),
        make_optimizer(config),
    )
    eval_step = make_eval_step(config, model, ap)
    out = sweep_checkpoints(
        args.checkpoints_path, template, eval_step, loader,
        fast=args.fast, max_items=args.max_items, sdr_backend=sdr_backend,
    )
    print(json.dumps({
        "best_path": out["best_path"],
        "best_metric": out["best_metric"],
        "best_loss_path": out["best_loss_path"],
        "best_loss": out["best_loss"],
        "n_checkpoints": len(out["results"]),
    }))


if __name__ == "__main__":
    main()
