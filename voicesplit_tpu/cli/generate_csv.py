"""VCTK-style triplet-CSV generator.

Capability of reference `scripts/generate_VCTK_dev_csv.py:6-46`: for every
ordered speaker pair, pick a clean utterance + a distinct embedding
reference from the clean speaker and an interference utterance from the
other speaker, rejecting clips shorter than ``audio_len`` seconds (VCTK
texts are parallel, so same-name clips are rejected between speakers).

    python -m voicesplit_tpu.cli.generate_csv --dataset_dir VCTK/wav48 \
        --output dev.csv [--speakers p225 p226 ...] [--sample_rate 16000] \
        [--audio_len 3.0] [--max_pairs N] [--seed 0]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate a triplet CSV from a speaker-per-directory corpus")
    parser.add_argument("--dataset_dir", type=str, required=True,
                        help="root with one subdirectory of wavs per speaker")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--speakers", type=str, nargs="*", default=None,
                        help="speaker subdirectories (default: all)")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--audio_len", type=float, default=3.0)
    parser.add_argument("--max_pairs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import random

    import pandas as pd

    from voicesplit_tpu.dsp.audio_io import load_wav

    rng = random.Random(args.seed)
    speakers = args.speakers or sorted(
        d for d in os.listdir(args.dataset_dir)
        if os.path.isdir(os.path.join(args.dataset_dir, d))
    )
    min_samples = int(args.sample_rate * args.audio_len)

    def long_enough(spk: str, name: str) -> bool:
        try:
            wav = load_wav(os.path.join(args.dataset_dir, spk, name), args.sample_rate)
        except Exception:
            return False
        return len(wav) >= min_samples

    def pick(spk: str, reject=(), tries: int = 20):
        files = [f for f in os.listdir(os.path.join(args.dataset_dir, spk)) if f.endswith(".wav")]
        rng.shuffle(files)
        for name in files[:tries]:
            # reject parallel-text / duplicate clips by suffix (utterance id)
            suffix = name.replace(spk, "")
            if suffix in reject:
                continue
            if long_enough(spk, name):
                return name, suffix
        return None, None

    rows = []
    # every ORDERED speaker pair (reference builds N*(N-1) rows; unordered
    # pairs would skew which speakers ever appear as the clean target)
    for clean_spk in speakers:
        for intf_spk in speakers:
            if intf_spk == clean_spk:
                continue
            clean, clean_sfx = pick(clean_spk)
            if clean is None:
                continue
            emb, _ = pick(clean_spk, reject=(clean_sfx,))
            if emb is None:
                continue
            intf, _ = pick(intf_spk, reject=(clean_sfx,))
            if intf is None:
                continue
            rows.append([
                os.path.join(clean_spk, clean),
                os.path.join(clean_spk, emb),
                os.path.join(intf_spk, intf),
            ])
            if args.max_pairs and len(rows) >= args.max_pairs:
                break
        if args.max_pairs and len(rows) >= args.max_pairs:
            break

    df = pd.DataFrame(rows, columns=["clean_utterance", "embedding_utterance", "interference_utterance"])
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    df.to_csv(args.output, index=False)
    print(f"wrote {len(rows)} triplets to {args.output}")


if __name__ == "__main__":
    main()
