"""Convert an offline BiLSTM checkpoint into a streaming warm-start.

    python -m voicesplit_tpu.cli.convert_streaming \
        --checkpoint_path ckpt.msgpack --output_dir stream_ckpts/ \
        [--no_causal]

Seeds the zero-lookahead deployment model (causal convs + forward-only
LSTM) from a trained offline BiLSTM checkpoint — lstm fwd_* verbatim,
fc1 collapsed as W_f + W_b, everything else copied — so causal
fine-tuning starts from learned weights instead of from scratch
(`train/checkpoint.py::bilstm_to_streaming_sd`).  Fine-tune with
`cli.train --checkpoint_path <emitted> -c <causal config>`.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="BiLSTM → streaming warm-start")
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--no_causal", action="store_true",
                        help="keep symmetric (non-causal) convs in the "
                             "emitted config; only the LSTM becomes uni")
    args = parser.parse_args(argv)

    from voicesplit_tpu.train.checkpoint import convert_bilstm_checkpoint_to_streaming

    path = convert_bilstm_checkpoint_to_streaming(
        args.checkpoint_path, args.output_dir, causal=not args.no_causal
    )
    print(f"wrote streaming warm-start: {path}")


if __name__ == "__main__":
    main()
