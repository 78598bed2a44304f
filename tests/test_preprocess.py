"""Preprocessing / dataset-prep tool tests: CSV mixing (both modes),
LibriSpeech path resolution, CSV generation, resampling, mel backends."""

import os

import numpy as np
import pytest

from voicesplit_tpu.config import Config
from voicesplit_tpu.data.preprocess import (
    preprocess_csv,
    preprocess_csv_sequential,
    read_triplet_csv,
    resolve_librispeech,
    resolve_triplets,
)
from voicesplit_tpu.dsp.audio_io import load_wav, save_wav_float

SR = 16000


def _voice(seed, n, amp=0.2):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * rng.uniform(120, 320) * t)).astype(np.float32)


@pytest.fixture()
def corpus(tmp_path):
    """speaker-per-dir corpus + triplet csv."""
    root = tmp_path / "corpus"
    for spk in ("s1", "s2"):
        d = root / spk
        d.mkdir(parents=True)
        for k in range(3):
            save_wav_float(_voice(hash((spk, k)) % 1000, SR * 4), str(d / f"{spk}_{k:03d}.wav"), SR)
    csv = tmp_path / "train.csv"
    csv.write_text(
        "clean_utterance,embedding_utterance,interference_utterance\n"
        "s1/s1_000.wav,s1/s1_001.wav,s2/s2_000.wav\n"
        "s1/s1_002.wav,s1/s1_000.wav,s2/s2_001.wav\n"
    )
    return root, csv, tmp_path


def test_resolve_librispeech():
    p = resolve_librispeech("1234-5678-0001", "/data")
    assert p == "/data/1234/5678/1234-5678-0001-norm.wav"


def test_read_and_resolve(corpus):
    root, csv, _ = corpus
    rows = read_triplet_csv(str(csv))
    assert len(rows) == 2
    resolved = resolve_triplets(rows, str(root))
    assert all(os.path.exists(p) for trip in resolved for p in trip)


def test_preprocess_csv_overlap(corpus):
    root, csv, tmp = corpus
    c = Config()
    out = str(tmp / "out")
    n = preprocess_csv(c, str(csv), str(root), out, num_workers=1, save_specs=True)
    assert n == 2
    mixed = load_wav(os.path.join(out, "000000-mixed.wav"), SR)
    target = load_wav(os.path.join(out, "000000-target.wav"), SR)
    assert len(mixed) == SR * 3
    # normalization: peak at 1/1.1
    assert np.isclose(np.abs(mixed).max(), 1 / 1.1, atol=2e-3)
    spec = np.load(os.path.join(out, "000000-mixed.npy"))
    assert spec.shape == (301, 601)


def test_preprocess_csv_sequential(corpus):
    root, csv, tmp = corpus
    # noise files
    for i in range(2):
        save_wav_float(
            (0.01 * np.random.default_rng(i).standard_normal(SR * 12)).astype(np.float32),
            str(root / f"noise{i}.wav"), SR,
        )
    noise_csv = tmp / "noise.csv"
    noise_csv.write_text("noise\nnoise0.wav\nnoise1.wav\n")
    c = Config()
    out = str(tmp / "out_seq")
    n = preprocess_csv_sequential(
        c, str(csv), str(noise_csv), str(root), out, num_workers=1
    )
    assert n >= 4  # up to 4 variants per row
    files = sorted(os.listdir(out))
    assert any("_1-mixed.wav" in f.replace("000000", "") or "000000_1-mixed.wav" == f for f in files)


def test_generate_csv_cli(corpus, capsys):
    root, _, tmp = corpus
    from voicesplit_tpu.cli.generate_csv import main

    out_csv = str(tmp / "dev.csv")
    main(["--dataset_dir", str(root), "--output", out_csv, "--audio_len", "2.0"])
    rows = read_triplet_csv(out_csv)
    assert len(rows) >= 1
    clean, emb, intf = rows[0]
    assert clean.split("/")[0] == emb.split("/")[0]  # same speaker
    assert clean != emb
    assert intf.split("/")[0] != clean.split("/")[0]


def test_resample_cli(tmp_path, capsys):
    from voicesplit_tpu.cli.resample import main

    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    import scipy.io.wavfile

    scipy.io.wavfile.write(str(d / "a.wav"), 44100, (0.5 * np.sin(np.arange(44100) / 20)).astype(np.float32))
    # default mode is ebu (ffmpeg-normalize parity): R128 loudness target
    main(["--root", str(tmp_path / "tree"), "--num_workers", "1"])
    out = load_wav(str(d / "a-norm.wav"))
    assert abs(len(out) - 16000) < 10
    from voicesplit_tpu.dsp.loudness import integrated_lufs

    assert abs(integrated_lufs(out, 16000) - (-23.0)) < 1.0
    # peak mode scales to --peak (0.95 default)
    main(["--root", str(tmp_path / "tree"), "--num_workers", "1",
          "--mode", "peak", "--suffix=-peak"])
    out = load_wav(str(d / "a-peak.wav"))
    assert np.isclose(np.abs(out).max(), 0.95, atol=0.01)


def test_wavernn_mel_spec_mode():
    from voicesplit_tpu.config import AudioConfig
    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.dsp.stft import num_frames

    cfg = AudioConfig(backend="wavernn", mel_spec=True)
    ap = AudioProcessor(cfg)
    y = _voice(1, SR * 2, amp=0.05)
    spec, phase = ap.wav2spec(y)
    T = num_frames(len(y), ap.n_fft, ap.hop_length)
    assert spec.shape == (T, 80)  # mel bins, not linear
    # griffin-lim inversion through mel->linear pinv
    cfg.wavernn.griffin_lim_iters = 2
    ap2 = AudioProcessor(cfg)
    wav = ap2.spec2wav(spec)
    assert np.isfinite(wav).all()


def test_read_triplet_csv_headerless(tmp_path):
    """Headerless reference-style CSVs (train_small.csv) must keep their
    first row — the reference's header=0 default silently ate it."""
    csv = tmp_path / "nohdr.csv"
    csv.write_text(
        "s1/s1_000.wav,s1/s1_001.wav,s2/s2_000.wav\n"
        "s1/s1_002.wav,s1/s1_000.wav,s2/s2_001.wav\n"
    )
    rows = read_triplet_csv(str(csv))
    assert len(rows) == 2
    assert rows[0][0] == "s1/s1_000.wav"


def test_save_specs_use_run_audio_config(corpus):
    """*-{target,mixed}.npy spectrograms must come from THE RUN'S audio
    config, not the library default (they used to be computed with the
    default 1200-point STFT regardless of config)."""
    root, csv, tmp = corpus
    out = tmp / "out_specs"
    c = Config()
    c.audio.voicefilter.n_fft = 800  # -> num_freq 401, non-default
    c.audio.voicefilter.num_freq = 401
    n = preprocess_csv(c, str(csv), str(root), str(out), num_workers=1, save_specs=True)
    assert n == 2
    import glob as _glob

    specs = sorted(_glob.glob(str(out / "*-target.npy")))
    assert specs
    spec = np.load(specs[0])
    assert spec.shape[-1] == 401, spec.shape
