"""Golden regression against the reference repo's committed demo audios
(Google's VoiceFilter demo set — real speech).

Validates our SI-SNRi/SDRi implementations against the numbers the
reference's report derives from the same files (`Final Report.pdf`
Table 2: SI-SNRi 10.55729, SDRi 10.99677 for Google's enhanced outputs)
and pins our DSP round-trip quality on real speech.
"""

import glob
import os

import numpy as np
import pytest

from voicesplit_tpu.dsp.audio_io import load_wav

BASE = "/root/reference/datasets/LibriSpeech/audios_demo"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference demo audios not mounted"
)


def _pairs(variant="enhanced"):
    out = []
    for est_path in sorted(glob.glob(f"{BASE}/2_speakers/{variant}/*.wav")):
        name = os.path.basename(est_path)[:-4]
        clean_id = name.split(".")[0]
        clean = load_wav(f"{BASE}/clean/{clean_id}.wav", 16000)
        noisy = load_wav(f"{BASE}/2_speakers/noisy/{name}.wav", 16000)
        est = load_wav(est_path, 16000)
        n = min(len(clean), len(noisy), len(est))
        out.append((clean[:n], noisy[:n], est[:n]))
    return out


def test_google_demo_si_snri_matches_report():
    from voicesplit_tpu.eval.metrics import si_snr_improvement

    vals = [si_snr_improvement(est, clean, noisy) for clean, noisy, est in _pairs()]
    mean = float(np.mean(vals))
    # report: 10.55729 — tolerance covers file-variant/truncation choices
    assert abs(mean - 10.557) < 1.0, mean


def test_google_demo_sdri_matches_report():
    from voicesplit_tpu.eval.metrics import sdr_improvement

    vals = [sdr_improvement(est, clean, noisy) for clean, noisy, est in _pairs()]
    mean = float(np.mean(vals))
    # report: 10.99677
    assert abs(mean - 10.997) < 1.0, mean


def test_real_speech_spec_roundtrip():
    """wav → spec → wav with true phase on real speech: > 30 dB SNR."""
    from voicesplit_tpu.config import AudioConfig
    from voicesplit_tpu.dsp.processor import AudioProcessor

    ap = AudioProcessor(AudioConfig())
    clean, noisy, est = _pairs()[0]
    y = clean[: 16000 * 3] * 0.5  # stay below the 0 dB spec clip
    spec, phase = ap.wav2spec(y)
    rec = ap.spec2wav(spec, phase)
    n = min(len(rec), len(y))
    seg, ref = rec[2000 : n - 2000], y[2000 : n - 2000]
    snr = 10 * np.log10(np.sum(ref**2) / np.sum((seg - ref) ** 2))
    assert snr > 30, snr
