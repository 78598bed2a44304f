"""End-to-end CLI tests: train → test → sweep → separate → convert,
driven through the argparse entry points (in-process, CPU)."""

import json
import os

import numpy as np
import pytest

from voicesplit_tpu.config import Config
from voicesplit_tpu.data import build_synthetic_dataset

SR = 16000


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    c = Config()
    c.model_name = "voicefilter"
    c.loss.loss_name = "power_law_compression"
    c.audio.audio_len = 0.6
    c.model.lstm_dim = 16
    c.model.fc1_dim = 24
    c.model.conv_channels = 4
    c.model.conv_out_channels = 2
    c.train_config.batch_size = 2
    c.train_config.compute_dtype = "float32"
    c.train_config.summary_interval = 2
    c.train_config.checkpoint_interval = 3
    c.train_config.epochs = 50
    c.dataset.train_dir = str(root / "train")
    c.dataset.test_dir = str(root / "test")
    c.train_config.logs_path = str(root / "logs")
    build_synthetic_dataset(c.dataset.train_dir, 6, SR, c.audio.audio_len, seed=0)
    build_synthetic_dataset(c.dataset.test_dir, 3, SR, c.audio.audio_len, seed=9)
    cfg_path = str(root / "config.json")
    with open(cfg_path, "w") as f:
        f.write(c.to_json())
    return root, c, cfg_path


def test_cli_train(workspace, capsys):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.train import main

    main(["-c", cfg_path, "--max_steps", "4"])
    out = capsys.readouterr().out
    assert "done:" in out
    assert os.path.exists(os.path.join(c.train_config.logs_path, "checkpoint_3.msgpack"))
    assert os.path.exists(os.path.join(c.train_config.logs_path, "config.json"))


def test_cli_test(workspace, capsys):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.test import main

    ckpt = os.path.join(c.train_config.logs_path, "checkpoint_3.msgpack")
    main(["--checkpoint_path", ckpt, "--no_sdr"])  # config from checkpoint
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(metrics["loss"]) and "si_snr" in metrics


def test_cli_sweep(workspace, capsys):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.sweep import main

    main(["--checkpoints_path", c.train_config.logs_path, "--fast", "--batch_size", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_checkpoints"] >= 1
    assert os.path.exists(os.path.join(c.train_config.logs_path, "fast_best_checkpoint.msgpack"))


def test_cli_separate(workspace, capsys):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.separate import main

    ckpt = os.path.join(c.train_config.logs_path, "checkpoint_3.msgpack")
    mixed = sorted((root / "test").glob("*-mixed.wav"))[0]
    emb = sorted((root / "test").glob("*-emb.npy"))[0]
    out_path = str(root / "separated.wav")
    main([
        "--checkpoint_path", ckpt, "--mixed_wav", str(mixed),
        "--emb", str(emb), "--output", out_path,
    ])
    assert os.path.exists(out_path)
    from voicesplit_tpu.dsp.audio_io import load_wav

    wav = load_wav(out_path, SR)
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_cli_separate_sequence_parallel(workspace, capsys):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.separate import main

    ckpt = os.path.join(c.train_config.logs_path, "checkpoint_3.msgpack")
    mixed = sorted((root / "test").glob("*-mixed.wav"))[0]
    emb = sorted((root / "test").glob("*-emb.npy"))[0]
    out_path = str(root / "separated_sp.wav")
    main([
        "--checkpoint_path", ckpt, "--mixed_wav", str(mixed),
        "--emb", str(emb), "--output", out_path, "--sequence_parallel",
    ])
    from voicesplit_tpu.dsp.audio_io import load_wav

    wav = load_wav(out_path, SR)
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_cli_export(workspace, capsys, tmp_path):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.export import main

    ckpt = os.path.join(c.train_config.logs_path, "checkpoint_3.msgpack")
    out = str(tmp_path / "sep.stablehlo")
    main(["--checkpoint_path", ckpt, "--output", out, "--seconds", "0.6"])
    assert os.path.exists(out) and os.path.exists(out + ".json")

    # the artifact must run and agree with the live pipeline
    from voicesplit_tpu.export import load_artifact, make_e2e_separation_fn
    from voicesplit_tpu.train.checkpoint import load_model_variables

    fn = load_artifact(out)
    rng = np.random.default_rng(0)
    L = int(SR * 0.6)
    wav = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    emb = rng.standard_normal((2, c.model.emb_dim)).astype(np.float32)
    got = np.asarray(fn(wav, emb))
    variables = load_model_variables(c, ckpt)
    ref = np.asarray(make_e2e_separation_fn(c, variables)(wav, emb))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # streaming artifact (needs a uni-LSTM checkpoint — the BiLSTM one
    # from cli.train has incompatible lstm/fc1 shapes)
    import jax
    import jax.numpy as jnp

    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train.checkpoint import save_checkpoint
    from voicesplit_tpu.train.state import TrainState

    sm = make_masknet(c, streaming=True)
    sv = sm.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 601)), jnp.zeros((1, 256)))
    ckpt2 = save_checkpoint(
        str(tmp_path),
        TrainState(step=jnp.int32(0), params=sv["params"],
                   batch_stats=sv.get("batch_stats", {}), opt_state={}),
        c,
    )
    out2 = str(tmp_path / "chunk.stablehlo")
    main(["--checkpoint_path", ckpt2, "--output", out2, "--streaming",
          "--chunk_frames", "10"])
    manifest = json.load(open(out2 + ".json"))
    assert manifest["chunk_samples"] == 10 * 160


def test_cli_convert(workspace, capsys, tmp_path):
    root, c, cfg_path = workspace
    import numpy as np

    from voicesplit_tpu.cli.convert import main
    from voicesplit_tpu.dsp.processor import AudioProcessor

    c2 = Config()
    c2.audio.voicefilter.griffin_lim_iters = 2
    ap = AudioProcessor(c2.audio)
    spec_dir = tmp_path / "specs"
    spec_dir.mkdir()
    wav = 0.01 * np.sin(2 * np.pi * 220 * np.arange(SR) / SR).astype(np.float32)
    spec, _ = ap.wav2spec(wav)
    np.save(spec_dir / "a.npy", spec)
    cfg2 = tmp_path / "c.json"
    cfg2.write_text(c2.to_json())
    out_dir = tmp_path / "wavs"
    main(["--input_dir", str(spec_dir), "--output_dir", str(out_dir), "-c", str(cfg2)])
    assert (out_dir / "a.wav").exists()


def test_cli_extract_embeddings(workspace, capsys):
    root, c, cfg_path = workspace
    from voicesplit_tpu.cli.extract_embeddings import main

    # smoke mode (random-init encoder) over the test dir's ref wavs
    main(["--data_dir", c.dataset.test_dir, "--out_suffix=-emb2.npy"])
    out = capsys.readouterr().out
    assert "wrote" in out
    embs = sorted((root / "test").glob("*-emb2.npy"))
    assert embs and np.load(embs[0]).shape == (256,)


def test_cli_extract_embeddings_corentinj(workspace, tmp_path, capsys):
    """End-to-end CorentinJ path: a pretrained.pt-style payload
    ({"model_state": sd}) drives extraction, and the CLI's windowed
    batched output matches the torch topology run directly on the same
    linear-power mel."""
    import torch

    from tests.test_speaker_encoder import _TorchCorentinJ
    from voicesplit_tpu.cli.extract_embeddings import main
    from voicesplit_tpu.dsp.audio_io import load_wav
    from voicesplit_tpu.models.speaker_encoder import corentinj_mel

    root, c, cfg_path = workspace
    tm = _TorchCorentinJ(hidden=256, emb_dim=256, window=160, stride=80)
    tm.eval()
    pt = tmp_path / "pretrained.pt"
    torch.save({"model_state": tm.state_dict(), "step": 1}, pt)

    main(["--data_dir", c.dataset.test_dir, "--encoder", "corentinj",
          "--encoder_checkpoint", str(pt), "--out_suffix=-embcj.npy"])
    assert "wrote" in capsys.readouterr().out

    wavs = sorted((root / "test").glob("*-ref_emb.wav"))
    embs = sorted((root / "test").glob("*-embcj.npy"))
    assert wavs and len(embs) == len(wavs)
    wav = load_wav(str(wavs[0]), 16000)
    mel = corentinj_mel(wav)
    if mel.shape[1] >= 160:  # long enough for one partial
        with torch.no_grad():
            expected = tm(torch.from_numpy(mel)).numpy()
        got = np.load(embs[0])
        np.testing.assert_allclose(got, expected, atol=5e-5)
