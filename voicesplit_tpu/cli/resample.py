"""Parallel resample/normalize of a wav tree.

Capability of reference `scripts/normalise-resample.sh` (ffmpeg-normalize
flac→16 kHz mono ``-norm.wav``, FIFO-semaphore parallelism) without the
ffmpeg dependency: polyphase resampling + normalization over a process
pool.  ``--mode ebu`` (default, ffmpeg-normalize's behavior) normalizes
integrated loudness to ``--target_lufs`` via BS.1770 measurement
(`dsp/loudness.py`); ``--mode peak`` scales to a peak level.  (FLAC
inputs are out of scope — decode those with ffmpeg first;
LibriSpeech/VCTK mirrors commonly ship wavs.)

    python -m voicesplit_tpu.cli.resample --root DIR [--sample_rate 16000] \
        [--suffix -norm] [--mode ebu|peak] [--target_lufs -23] \
        [--peak 0.95] [--num_workers N]
"""

from __future__ import annotations

import argparse
import os
from functools import partial
from multiprocessing import cpu_count, get_context


def _process(path: str, sample_rate: int, suffix: str, mode: str,
             peak: float, target_lufs: float) -> bool:
    import numpy as np

    from voicesplit_tpu.dsp.audio_io import load_wav, save_wav_float

    try:
        wav = load_wav(path, sample_rate)
        if mode == "ebu":
            from voicesplit_tpu.dsp.loudness import loudness_normalize

            wav = loudness_normalize(wav, sample_rate, target_lufs)
        else:
            m = float(np.max(np.abs(wav)))
            if m > 0:
                wav = wav * (peak / m)
        out = os.path.splitext(path)[0] + suffix + ".wav"
        save_wav_float(wav, out, sample_rate)
        return True
    except Exception as e:
        print(f"skip {path}: {e}")
        return False


def main(argv=None):
    parser = argparse.ArgumentParser(description="Resample + peak-normalize a wav tree")
    parser.add_argument("--root", type=str, required=True)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--suffix", type=str, default="-norm")
    parser.add_argument("--mode", type=str, default="ebu", choices=["ebu", "peak"],
                        help="ebu = R128 loudness normalize (ffmpeg-normalize's "
                             "default behavior); peak = scale to --peak")
    parser.add_argument("--target_lufs", type=float, default=-23.0)
    parser.add_argument("--peak", type=float, default=0.95)
    parser.add_argument("--num_workers", type=int, default=None)
    args = parser.parse_args(argv)

    files = []
    for dirpath, _, names in os.walk(args.root):
        for n in names:
            if n.endswith(".wav") and not n.endswith(args.suffix + ".wav"):
                files.append(os.path.join(dirpath, n))
    worker = partial(_process, sample_rate=args.sample_rate, suffix=args.suffix,
                     mode=args.mode, peak=args.peak, target_lufs=args.target_lufs)
    with get_context("spawn").Pool(args.num_workers or cpu_count()) as pool:
        results = pool.map(worker, files)
    print(f"processed {sum(results)}/{len(files)} files under {args.root}")


if __name__ == "__main__":
    main()
