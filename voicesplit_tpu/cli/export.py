"""Export a servable separation artifact (StableHLO, weights baked in).

    python -m voicesplit_tpu.cli.export --checkpoint_path ckpt.msgpack \
        --output sep.stablehlo [--seconds 3.0] [--platforms tpu,cpu] \
        [--fixed_batch N]
    python -m voicesplit_tpu.cli.export --checkpoint_path ckpt.msgpack \
        --output chunk.stablehlo --streaming [--chunk_frames 50] \
        [--batch_size 1]

The artifact is a self-contained portable program (`jax.export`); a
server loads it with `voicesplit_tpu.export.load_artifact` (or feeds the
StableHLO to PJRT directly) — no Python model code, no checkpoint
parsing at serve time.  See `voicesplit_tpu/export.py`.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="AOT-export a separation program")
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--seconds", type=float, default=3.0,
                        help="clip length of the e2e program (static shape)")
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma list, e.g. tpu,cpu (default: current)")
    parser.add_argument("--fixed_batch", type=int, default=None,
                        help="pin B instead of exporting it symbolic")
    parser.add_argument("--streaming", action="store_true",
                        help="export the streaming chunk step instead")
    parser.add_argument("--chunk_frames", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=1,
                        help="streaming state batch size")
    args = parser.parse_args(argv)

    from voicesplit_tpu.config import load_config
    from voicesplit_tpu.export import export_separator, export_streaming, save_artifact
    from voicesplit_tpu.train.checkpoint import (
        config_from_checkpoint,
        load_model_variables,
    )

    config = (
        load_config(args.config_path)
        if args.config_path
        else config_from_checkpoint(args.checkpoint_path)
    )
    platforms = args.platforms.split(",") if args.platforms else None
    variables = load_model_variables(
        config, args.checkpoint_path, streaming=args.streaming
    )

    if args.streaming:
        data, manifest = export_streaming(
            config, variables, chunk_frames=args.chunk_frames,
            batch_size=args.batch_size, platforms=platforms,
        )
    else:
        data = export_separator(
            config, variables, seconds=args.seconds, platforms=platforms,
            symbolic_batch=args.fixed_batch is None,
            batch_size=args.fixed_batch or 1,
        )
        manifest = {
            "kind": "e2e_separator",
            "seconds": args.seconds,
            "batch": args.fixed_batch or "symbolic",
            "platforms": platforms or "default",
        }
    save_artifact(args.output, data, manifest)
    print(f"wrote {args.output} ({len(data) / 1e6:.1f} MB) + manifest .json")


if __name__ == "__main__":
    main()
