"""GE2E speaker-encoder parity: the torch-state-dict import reproduces a
torch reference encoder's embeddings."""

import numpy as np
import torch

import jax.numpy as jnp

from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder, load_torch_state_dict


class _TorchGE2E(torch.nn.Module):
    """Same topology as the reference notebook's SpeakerEncoder
    (`GE2E-...-openvoicefilter.py:63-85`), used as a golden generator."""

    def __init__(self, num_mels=40, lstm_hidden=32, lstm_layers=3, emb_dim=16,
                 window=20, stride=10):
        super().__init__()
        self.lstm = torch.nn.LSTM(num_mels, lstm_hidden, num_layers=lstm_layers,
                                  batch_first=True)
        self.proj = torch.nn.Linear(lstm_hidden, emb_dim)
        self.window, self.stride = window, stride

    def forward(self, mel):  # [M, T]
        mels = mel.unfold(1, self.window, self.stride)  # [M, T', W]
        mels = mels.permute(1, 2, 0)  # [T', W, M]
        x, _ = self.lstm(mels)
        x = x[:, -1, :]
        x = self.proj(x)
        x = x / torch.norm(x, p=2, dim=1, keepdim=True)
        return x.sum(0) / x.size(0)


def test_torch_import_matches():
    tm = _TorchGE2E()
    tm.eval()
    mel = np.random.default_rng(0).standard_normal((40, 95)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(mel)).numpy()

    sd = {k.replace("proj.", "proj.linear_layer."): v.numpy()
          for k, v in tm.state_dict().items()}
    variables = load_torch_state_dict(sd)
    enc = SpeakerEncoder(num_mels=40, lstm_hidden=32, lstm_layers=3, emb_dim=16,
                         window=20, stride=10)
    got = np.asarray(enc.apply(variables, jnp.asarray(mel)[None]))[0]
    np.testing.assert_allclose(got, expected, atol=2e-5)


class _TorchCorentinJ(torch.nn.Module):
    """The CorentinJ Real-Time-Voice-Cloning encoder topology, built from
    its public spec as a golden generator: 3-layer LSTM → Linear → ReLU →
    L2-norm per partial; partials of `window` frames at 50% overlap;
    mean-pool + renorm (`embed_utterance`)."""

    def __init__(self, num_mels=40, hidden=24, layers=3, emb_dim=24,
                 window=16, stride=8):
        super().__init__()
        self.lstm = torch.nn.LSTM(num_mels, hidden, num_layers=layers,
                                  batch_first=True)
        self.linear = torch.nn.Linear(hidden, emb_dim)
        self.window, self.stride = window, stride

    def forward(self, mel):  # [M, T]
        parts = mel.unfold(1, self.window, self.stride).permute(1, 2, 0)  # [P, W, M]
        _, (h, _) = self.lstm(parts)
        e = torch.relu(self.linear(h[-1]))
        e = e / (torch.norm(e, p=2, dim=1, keepdim=True) + 1e-8)
        raw = e.mean(0)
        return raw / (torch.norm(raw) + 1e-8)


def test_corentinj_import_matches():
    from voicesplit_tpu.models.speaker_encoder import load_corentinj_state_dict

    tm = _TorchCorentinJ()
    tm.eval()
    mel = np.random.default_rng(3).standard_normal((40, 50)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(mel)).numpy()

    # checkpoint keys as in encoder/pretrained.pt (plus the GE2E loss
    # scalars the importer must ignore)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    sd["similarity_weight"] = np.asarray([10.0], np.float32)
    sd["similarity_bias"] = np.asarray([-5.0], np.float32)
    variables = load_corentinj_state_dict(sd)
    enc = SpeakerEncoder(num_mels=40, lstm_hidden=24, lstm_layers=3, emb_dim=24,
                         window=16, stride=8, proj_relu=True, final_renorm=True)
    got = np.asarray(enc.apply(variables, jnp.asarray(mel)[None]))[0]
    np.testing.assert_allclose(got, expected, atol=2e-5)
    assert abs(float(np.linalg.norm(got)) - 1.0) < 1e-5


def test_corentinj_full_size_shapes():
    """The real 256-d topology builds and embeds (weights random)."""
    from voicesplit_tpu.models.speaker_encoder import (
        corentinj_mel,
        make_corentinj_encoder,
    )

    import jax

    enc = make_corentinj_encoder()
    wav = np.random.default_rng(0).uniform(-0.5, 0.5, 16000 * 2).astype(np.float32)
    mel = corentinj_mel(wav)
    assert mel.shape[0] == 40 and mel.shape[1] >= 160
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(mel)[None])
    emb = np.asarray(enc.apply(variables, jnp.asarray(mel)[None]))[0]
    assert emb.shape == (256,)
    assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-4


def test_mulaw_roundtrip():
    from voicesplit_tpu.dsp.processor import AudioProcessor

    wav = np.random.default_rng(1).uniform(-1, 1, 1000).astype(np.float32)
    enc = AudioProcessor.mulaw_encode(wav, 9)
    assert enc.min() >= 0 and enc.max() <= 2**9 - 1
    # decode path: scale encoded back to [-1, 1] first (reference usage)
    dec = AudioProcessor.mulaw_decode(AudioProcessor.dequantize(enc, 9), 9)
    assert np.abs(dec - wav).max() < 0.02


def test_quantize_roundtrip():
    from voicesplit_tpu.dsp.processor import AudioProcessor

    x = np.linspace(-1, 1, 100).astype(np.float32)
    q = AudioProcessor.quantize(x, 10)
    np.testing.assert_allclose(AudioProcessor.dequantize(q, 10), x, atol=1e-6)


def test_window_batched_extraction_matches_direct():
    """The CLI's fixed-shape window-batched extraction (one compile for
    any utterance length) must equal the encoder's direct full-utterance
    forward: per-window L2-normalized embeddings, host mean-pool."""
    import jax
    import jax.numpy as jnp

    from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder

    enc = SpeakerEncoder(num_mels=8, lstm_hidden=16, emb_dim=12)
    rng = np.random.default_rng(0)
    T = 80 + 40 * 6 + 17  # 7 windows + ragged tail (dropped by both paths)
    mel = rng.standard_normal((8, T)).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))

    direct = np.asarray(enc.apply(variables, mel[None]))[0]

    W, S, WB = enc.window, enc.stride, 3  # WB chosen to force a padded tail chunk
    n_win = (T - W) // S + 1
    wins = np.stack([mel[:, s * S : s * S + W] for s in range(n_win)])
    apply_win = jax.jit(lambda m: enc.apply(variables, m))
    parts = []
    for i in range(0, n_win, WB):
        chunk = wins[i : i + WB]
        valid = len(chunk)
        if valid < WB:
            chunk = np.concatenate([chunk, np.zeros((WB - valid, *chunk.shape[1:]), np.float32)])
        parts.append(np.asarray(apply_win(chunk))[:valid])
    batched = np.concatenate(parts).mean(axis=0)
    np.testing.assert_allclose(batched, direct, atol=1e-5)
