"""Batch spec→wav conversion CLI (reference `convert.py:18-26`, minus the
hardcoded paths).

    python -m voicesplit_tpu.cli.convert --input_dir specs/ --output_dir wavs/ \
        [-c config.json]

Reads ``*.npy`` (or torch ``*.pt``) normalized spectrograms ``[T, F]``
and writes Griffin-Lim-reconstructed wavs.
"""

from __future__ import annotations

import argparse
import os
from glob import glob


def main(argv=None):
    parser = argparse.ArgumentParser(description="Griffin-Lim a folder of spectrograms")
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None)
    args = parser.parse_args(argv)

    from voicesplit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from voicesplit_tpu.config import Config, load_config
    from voicesplit_tpu.data.dataset import _load_array
    from voicesplit_tpu.dsp.processor import make_audio_processor

    config = load_config(args.config_path) if args.config_path else Config()
    ap = make_audio_processor(config)
    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(glob(os.path.join(args.input_dir, "*.npy"))) + sorted(
        glob(os.path.join(args.input_dir, "*.pt"))
    )
    for path in files:
        spec = np.asarray(_load_array(path), np.float32)
        wav = ap.spec2wav(spec)  # no phase → Griffin-Lim
        name = os.path.splitext(os.path.basename(path))[0] + ".wav"
        ap.save_wav(wav, os.path.join(args.output_dir, name))
        print(f"{path} -> {name}")
    print(f"converted {len(files)} files")


if __name__ == "__main__":
    main()
