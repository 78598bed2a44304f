"""Offline preprocessing: CSV triplets → mixed triplet files on disk.

Capability of reference `preprocess_by_csv.py:17-108` and
`preprocess_by_csv_without_voice_overlay.py:17-125`: read
``[clean, embedding_ref, interference]`` CSV rows, resolve LibriSpeech
``spk-chap-utt`` ids to paths, fan the mixing out over a process pool,
and write ``*-{ref_emb,target,mixed}.wav`` triplets (+ ``*-target.npy`` /
``*-mixed.npy`` spectrograms for backends whose spec extraction is the
slow part).
"""

from __future__ import annotations

import os
from functools import partial
from multiprocessing import cpu_count, get_context
from typing import List, Optional, Sequence, Tuple

import numpy as np

from voicesplit_tpu.config import Config, DatasetFormat
from voicesplit_tpu.data.mixer import MixedSample, mix_overlap, mix_sequential
from voicesplit_tpu.dsp.audio_io import load_wav, save_wav_float


_HEADER_WORDS = ("utterance", "clean", "embedding", "interference", "noise", "file", "path")


def _read_csv_rows(path: str):
    """CSV rows with header auto-detection.

    The reference's own fixtures are inconsistent (train_small.csv has no
    header, test_config.csv does — and the reference's header=0 default
    silently eats the first triplet of headerless files); here the first
    row is treated as a header only when it looks like one."""
    import pandas as pd

    df = pd.read_csv(path, sep=",", header=None, dtype=str)
    first = [str(x).strip().lower() for x in df.iloc[0]]
    if any(any(w in cell for w in _HEADER_WORDS) for cell in first):
        df = df.iloc[1:]
    return df.values


def read_triplet_csv(path: str) -> List[Tuple[str, str, str]]:
    """Rows of ``[clean, embedding_ref, interference]`` (header optional)."""
    return [tuple(map(str, row[:3])) for row in _read_csv_rows(path)]


def resolve_librispeech(utt_id: str, root: str, suffix: str = "-norm.wav") -> str:
    """``spk-chap-utt`` → ``root/spk/chap/spk-chap-utt-norm.wav``

    (reference `preprocess_by_csv.py:74-99`)."""
    spk, chap = utt_id.split("-")[:2]
    return os.path.join(root, spk, chap, utt_id + suffix)


def resolve_triplets(
    rows: Sequence[Tuple[str, str, str]],
    root: str,
    librispeech: bool = False,
) -> List[Tuple[str, str, str]]:
    if librispeech:
        return [
            tuple(resolve_librispeech(x, root) for x in (c, e, i))
            for c, e, i in rows
        ]
    return [tuple(os.path.join(root, x) for x in (c, e, i)) for c, e, i in rows]


def _paths_for(out_dir: str, fmt: DatasetFormat, num: int, sub: Optional[int] = None):
    tag = "%06d" % num if sub is None else "%06d_%d" % (num, sub)

    def p(pattern: str, force_npy: bool = False) -> str:
        out = os.path.join(out_dir, pattern.replace("*", tag))
        if force_npy and out.endswith(".pt"):
            out = out[:-3] + ".npy"
        return out

    return {
        "emb_wav": p(fmt.emb_wav),
        "target_wav": p(fmt.target_wav),
        "mixed_wav": p(fmt.mixed_wav),
        "target": p(fmt.target, force_npy=True),
        "mixed": p(fmt.mixed, force_npy=True),
    }


def write_sample(
    sample: MixedSample,
    out_dir: str,
    fmt: DatasetFormat,
    num: int,
    sample_rate: int,
    ap=None,
    sub: Optional[int] = None,
) -> None:
    """Write one triplet; with an AudioProcessor, also saves .npy specs
    (reference saves torch .pt specs, `utils/generic_utils.py:339-345`)."""
    paths = _paths_for(out_dir, fmt, num, sub)
    save_wav_float(sample.emb_wav, paths["emb_wav"], sample_rate)
    save_wav_float(sample.target_wav, paths["target_wav"], sample_rate)
    save_wav_float(sample.mixed_wav, paths["mixed_wav"], sample_rate)
    if ap is not None:
        target_spec, _ = ap.wav2spec(load_wav(paths["target_wav"], sample_rate))
        mixed_spec, _ = ap.wav2spec(load_wav(paths["mixed_wav"], sample_rate))
        np.save(paths["target"], target_spec)
        np.save(paths["mixed"], mixed_spec)


# One AudioProcessor per worker process, built from the RUN's audio
# config (a fresh AP per row would both use wrong DSP params if only the
# default were rebuilt and retrace wav2spec every row).
_WORKER_AP = None
_WORKER_AP_KEY = None


def _worker_ap(audio_config):
    global _WORKER_AP, _WORKER_AP_KEY
    key = repr(audio_config)
    if _WORKER_AP is None or _WORKER_AP_KEY != key:
        from voicesplit_tpu.dsp.processor import AudioProcessor

        _WORKER_AP = AudioProcessor(audio_config)
        _WORKER_AP_KEY = key
    return _WORKER_AP


def _mix_one(
    args: Tuple[int, Tuple[str, str, str]],
    out_dir: str,
    fmt: DatasetFormat,
    sample_rate: int,
    audio_len: float,
    save_specs: bool,
    audio_config=None,
) -> bool:
    """Worker: returns True when a triplet was written."""
    num, (clean_path, emb_path, intf_path) = args
    try:
        emb = load_wav(emb_path, sample_rate)
        clean = load_wav(clean_path, sample_rate)
        intf = load_wav(intf_path, sample_rate)
    except Exception as e:
        print(f"skip {num}: unreadable input ({e})")
        return False
    sample = mix_overlap(emb, clean, intf, sample_rate, audio_len)
    if sample is None:
        return False
    ap = _worker_ap(audio_config) if save_specs else None
    write_sample(sample, out_dir, fmt, num, sample_rate, ap)
    return True


def preprocess_csv(
    config: Config,
    csv_path: str,
    dataset_root: str,
    out_dir: str,
    librispeech: bool = False,
    num_workers: Optional[int] = None,
    save_specs: bool = False,
    limit: Optional[int] = None,
) -> int:
    """Mix every CSV row into `out_dir`; returns the number written."""
    os.makedirs(out_dir, exist_ok=True)
    rows = resolve_triplets(read_triplet_csv(csv_path), dataset_root, librispeech)
    if limit:
        rows = rows[:limit]
    sample_rate = config.audio.active.sample_rate
    worker = partial(
        _mix_one,
        out_dir=out_dir,
        fmt=config.dataset.format,
        sample_rate=sample_rate,
        audio_len=config.audio.audio_len,
        save_specs=save_specs,
        audio_config=config.audio,
    )
    num_workers = num_workers or cpu_count()
    jobs = list(enumerate(rows))
    if num_workers <= 1:
        results = [worker(j) for j in jobs]
    else:
        with get_context("spawn").Pool(num_workers) as pool:
            results = pool.map(worker, jobs)
    return int(sum(results))


def _mix_one_sequential(
    args: Tuple[int, Tuple[str, str, str], Tuple[str, str]],
    out_dir: str,
    fmt: DatasetFormat,
    sample_rate: int,
    save_specs: bool,
    seed: int,
    audio_config=None,
) -> int:
    """Worker for the non-overlap/noise variant; returns #variants written."""
    num, (clean_path, emb_path, intf_path), (noise1_path, noise2_path) = args
    try:
        emb = load_wav(emb_path, sample_rate)
        clean = load_wav(clean_path, sample_rate)
        intf = load_wav(intf_path, sample_rate)
        n1 = load_wav(noise1_path, sample_rate)
        n2 = load_wav(noise2_path, sample_rate)
    except Exception as e:
        print(f"skip {num}: unreadable input ({e})")
        return 0
    rng = np.random.default_rng((seed, num))
    samples = mix_sequential(emb, clean, intf, n1, n2, sample_rate, rng)
    ap = _worker_ap(audio_config) if (save_specs and samples) else None
    for sub, sample in enumerate(samples, start=1):
        write_sample(sample, out_dir, fmt, num, sample_rate, ap, sub=sub)
    return len(samples)


def preprocess_csv_sequential(
    config: Config,
    csv_path: str,
    noise_csv_path: str,
    dataset_root: str,
    out_dir: str,
    librispeech: bool = False,
    num_workers: Optional[int] = None,
    save_specs: bool = False,
    limit: Optional[int] = None,
    seed: int = 0,
) -> int:
    """Non-overlap/noise preprocessing (reference
    `preprocess_by_csv_without_voice_overlay.py:17-125`): each triplet row
    gets a random noise *pair* from the noise CSV; up to 4 variants are
    written per row.  Returns total variants written."""
    os.makedirs(out_dir, exist_ok=True)
    rows = resolve_triplets(read_triplet_csv(csv_path), dataset_root, librispeech)
    if limit:
        rows = rows[:limit]
    noise_files = [
        os.path.join(dataset_root, str(r[0])) for r in _read_csv_rows(noise_csv_path)
    ]
    if len(noise_files) < 2:
        raise ValueError("noise CSV needs at least 2 files")
    rng = np.random.default_rng(seed)
    noise_pairs = [
        tuple(noise_files[i] for i in rng.choice(len(noise_files), 2, replace=False))
        for _ in rows
    ]
    sample_rate = config.audio.active.sample_rate
    worker = partial(
        _mix_one_sequential,
        out_dir=out_dir,
        fmt=config.dataset.format,
        sample_rate=sample_rate,
        save_specs=save_specs,
        seed=seed,
        audio_config=config.audio,
    )
    jobs = [(i, row, pair) for i, (row, pair) in enumerate(zip(rows, noise_pairs))]
    num_workers = num_workers or cpu_count()
    if num_workers <= 1:
        results = [worker(j) for j in jobs]
    else:
        with get_context("spawn").Pool(num_workers) as pool:
            results = pool.map(worker, jobs)
    return int(sum(results))
