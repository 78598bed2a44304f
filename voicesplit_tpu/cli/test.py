"""Single-checkpoint evaluation CLI (reference `test.py:25-100`).

    python -m voicesplit_tpu.cli.test --checkpoint_path ckpt.msgpack \
        [-c config.json] [--test_dir dir] [--no_sdr]

Config defaults to the one embedded in the checkpoint
(reference `test.py:85-89`).  Reports mean loss, SI-SNR, SDR, SI-SNRi.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate one checkpoint")
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--test_dir", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--no_sdr", action="store_true")
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
    from voicesplit_tpu.eval.validation import validate
    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train.checkpoint import (
        config_from_checkpoint,
        load_checkpoint,
        restore_train_state,
    )
    from voicesplit_tpu.train.state import create_train_state, make_optimizer
    from voicesplit_tpu.train.steps import make_eval_step

    if args.config_path:
        config = load_config(args.config_path)
    else:
        config = config_from_checkpoint(args.checkpoint_path)
    if args.test_dir:
        config.dataset.test_dir = args.test_dir
    if args.batch_size:
        config.test_config.batch_size = args.batch_size

    ap = make_audio_processor(config)
    model = make_masknet(config)
    loader = test_dataloader(config, ap)
    T = loader.dataset.n_frames
    template = create_train_state(
        config, model, jax.random.PRNGKey(0),
        (config.test_config.batch_size, T, ap.num_freq), make_optimizer(config),
    )
    state, _ = restore_train_state(load_checkpoint(args.checkpoint_path), template)
    eval_step = make_eval_step(config, model, ap)
    metrics = validate(
        eval_step, state.params, state.batch_stats, loader,
        compute_sdr=not args.no_sdr, log_sample=False, max_items=args.max_items,
        sdr_backend=args.sdr_backend,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
