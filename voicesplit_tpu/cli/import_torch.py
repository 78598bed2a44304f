"""Import a reference torch checkpoint into this framework.

    python -m voicesplit_tpu.cli.import_torch \
        --torch_checkpoint checkpoint_50000.pt --output_dir ckpts/ \
        [-c config.json]

The reference saves ``checkpoint_%d.pt`` payloads
``{'model','optimizer','step','config_str'}`` (reference
`train.py:126-132`).  This converts the model weights (layout transpose +
the flatten-order row permutation, see `train/torch_import.py`) into our
msgpack format; the config is recovered from the embedded ``config_str``
(reference `test.py:87-89`) unless ``-c`` overrides it.  The result
serves/evaluates/fine-tunes like any native checkpoint.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="reference .pt -> msgpack checkpoint")
    parser.add_argument("--torch_checkpoint", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None,
                        help="override the checkpoint-embedded config")
    args = parser.parse_args(argv)

    from voicesplit_tpu.config import load_config
    from voicesplit_tpu.train.torch_import import import_torch_checkpoint

    config = load_config(args.config_path) if args.config_path else None
    path = import_torch_checkpoint(args.torch_checkpoint, args.output_dir, config)
    print(f"imported {args.torch_checkpoint} -> {path}")


if __name__ == "__main__":
    main()
