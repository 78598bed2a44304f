"""Offline preprocessing CLI (reference `preprocess_by_csv.py`).

    python -m voicesplit_tpu.cli.preprocess -c config.json -r DATASET_ROOT \
        [-d train.csv] [-t test.csv] -o OUT_DIR [-l] [--save_specs] \
        [--num_workers N] [--limit N]

CSV rows are ``[clean, embedding_ref, interference]``; with ``-l`` ids are
resolved LibriSpeech-style (``spk-chap-utt`` → ``spk/chap/…-norm.wav``).
Writes ``train/`` and/or ``test/`` triplet directories under OUT_DIR.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Mix CSV triplets into a dataset")
    parser.add_argument("-c", "--config_path", type=str, required=True)
    parser.add_argument("-r", "--dataset_root_dir", type=str, required=True)
    parser.add_argument("-d", "--train_data_csv", type=str, default=None)
    parser.add_argument("-t", "--test_data_csv", type=str, default=None)
    parser.add_argument("-o", "--out_dir", type=str, required=True)
    parser.add_argument("-l", "--librispeech", action="store_true")
    parser.add_argument("--noise_csv", type=str, default=None,
                        help="noise-file CSV: switches to the non-overlap/noise "
                             "mixer emitting 4 variants per row")
    parser.add_argument("--save_specs", action="store_true",
                        help="also write *-target.npy / *-mixed.npy spectrograms")
    parser.add_argument("--num_workers", type=int, default=None)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    from voicesplit_tpu.config import load_config
    from voicesplit_tpu.data.preprocess import preprocess_csv, preprocess_csv_sequential

    config = load_config(args.config_path)
    for csv_path, split in ((args.train_data_csv, "train"), (args.test_data_csv, "test")):
        if not csv_path:
            continue
        out = os.path.join(args.out_dir, split)
        if args.noise_csv:
            n = preprocess_csv_sequential(
                config, csv_path, args.noise_csv, args.dataset_root_dir, out,
                librispeech=args.librispeech, num_workers=args.num_workers,
                save_specs=args.save_specs, limit=args.limit,
            )
        else:
            n = preprocess_csv(
                config, csv_path, args.dataset_root_dir, out,
                librispeech=args.librispeech, num_workers=args.num_workers,
                save_specs=args.save_specs, limit=args.limit,
            )
        print(f"{split}: wrote {n} triplets to {out}")


if __name__ == "__main__":
    main()
