"""Speaker-embedding extraction CLI.

Capability of the reference's offline notebook
(`notebooks/GE2E-...-openvoicefilter.py:129-152`): run the GE2E encoder
over every ``*-ref_emb.wav`` in a directory and write ``*-emb.npy``
d-vectors; too-short references get the scalar-``[0]`` sentinel the
dataset layer filters out.

    python -m voicesplit_tpu.cli.extract_embeddings --data_dir DIR \
        [--encoder_checkpoint embedder.pt|encoder_N.msgpack] [-c config.json]

Without a checkpoint the encoder runs with random init (useful for
pipeline smoke tests; pass the reference's pretrained ``embedder.pt``
for real d-vectors — its torch state_dict is converted automatically —
or a native ``.msgpack`` trained by `cli/train_encoder.py`).
``--encoder spectral`` instead computes training-free signal-derived
d-vectors (`models/speaker_encoder.py::spectral_dvector`) — no
checkpoint needed, supports unseen speakers.
"""

from __future__ import annotations

import argparse
import os
from glob import glob


def main(argv=None):
    parser = argparse.ArgumentParser(description="Extract GE2E d-vectors")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--encoder_checkpoint", type=str, default=None,
                        help="torch GE2E embedder.pt state_dict")
    parser.add_argument("--encoder", type=str, default="ge2e",
                        choices=("ge2e", "spectral", "corentinj", "speech2phone"),
                        help="'spectral' = training-free signal-derived "
                        "d-vectors; 'corentinj' = the Real-Time-Voice-Cloning "
                        "encoder topology (pass its pretrained.pt as "
                        "--encoder_checkpoint); 'speech2phone' = the tflearn "
                        "MFCC autoencoder's 80-d CReLU embedding (pass an "
                        ".npz/.pt weight export as --encoder_checkpoint)")
    parser.add_argument("--glob_wav", type=str, default="*-ref_emb.wav")
    parser.add_argument("--out_suffix", type=str, default="-emb.npy")
    args = parser.parse_args(argv)

    from voicesplit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np

    from voicesplit_tpu.config import Config, load_config
    from voicesplit_tpu.dsp.processor import make_audio_processor
    from voicesplit_tpu.models.speaker_encoder import SpeakerEncoder, load_torch_state_dict

    config = load_config(args.config_path) if args.config_path else Config()
    ap = make_audio_processor(config)

    if args.encoder == "spectral":
        from voicesplit_tpu.models.speaker_encoder import spectral_dvector

        files = sorted(glob(os.path.join(args.data_dir, args.glob_wav)))
        n_ok = 0
        for path in files:
            out_path = path.replace(args.glob_wav.replace("*", ""), "") + args.out_suffix
            wav = ap.load_wav(path)
            emb = spectral_dvector(wav, ap.sample_rate, emb_dim=config.model.emb_dim)
            np.save(out_path, emb)
            n_ok += 1
        print(f"wrote {n_ok} spectral embeddings in {args.data_dir}")
        return

    if args.encoder == "speech2phone":
        from voicesplit_tpu.models.speech2phone import (
            Speech2PhoneEncoder,
            load_speech2phone_weights,
            speech2phone_embedding,
        )

        encoder = Speech2PhoneEncoder()
        if args.encoder_checkpoint:
            variables = load_speech2phone_weights(args.encoder_checkpoint)
        else:
            print(" > No encoder checkpoint given — using random init (smoke mode)")
            variables = encoder.init(
                jax.random.PRNGKey(0), np.zeros((1, 13, 216), np.float32)
            )
        # fixed [W, 13, 216] window batches would recompile per window
        # count; the window count varies little (duration/1s), so jit on
        # the encoder and let the cache hold the few shapes that occur
        apply_fn = jax.jit(lambda m: encoder.apply(variables, m))
        files = sorted(glob(os.path.join(args.data_dir, args.glob_wav)))
        n_ok = n_short = 0
        for path in files:
            out_path = path.replace(args.glob_wav.replace("*", ""), "") + args.out_suffix
            wav = ap.load_wav(path)
            emb = speech2phone_embedding(
                encoder, variables, wav, ap.sample_rate, apply_fn=apply_fn
            )
            if emb.size == 1:
                n_short += 1
            else:
                n_ok += 1
            np.save(out_path, emb)
        print(f"wrote {n_ok} speech2phone embeddings ({n_short} sentinels) "
              f"in {args.data_dir}")
        return

    if args.encoder == "corentinj":
        from voicesplit_tpu.models.speaker_encoder import (
            load_corentinj_state_dict,
            make_corentinj_encoder,
        )

        encoder = make_corentinj_encoder()
        if args.encoder_checkpoint:
            import torch

            payload = torch.load(args.encoder_checkpoint, map_location="cpu",
                                 weights_only=False)
            sd = payload.get("model_state", payload)  # pretrained.pt wraps it
            sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
            variables = load_corentinj_state_dict(sd)
        else:
            print(" > No encoder checkpoint given — using random init (smoke mode)")
            mel0 = np.zeros((1, 40, encoder.window), np.float32)
            variables = encoder.init(jax.random.PRNGKey(0), mel0)
    elif args.encoder_checkpoint and args.encoder_checkpoint.endswith(".msgpack"):
        # native checkpoint written by cli/train_encoder.py — carries
        # its own topology
        from flax import serialization

        with open(args.encoder_checkpoint, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        enc_cfg = blob.get("encoder", {})
        encoder = SpeakerEncoder(
            num_mels=int(enc_cfg.get("num_mels", config.audio.active.num_mels)),
            lstm_hidden=int(enc_cfg.get("lstm_hidden", 768)),
            lstm_layers=int(enc_cfg.get("lstm_layers", 3)),
            emb_dim=int(enc_cfg.get("emb_dim", config.model.emb_dim)),
        )
        variables = {"params": blob["params"]["enc"]}
    elif args.encoder_checkpoint:
        import torch

        encoder = SpeakerEncoder(num_mels=config.audio.active.num_mels)
        sd = torch.load(args.encoder_checkpoint, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        variables = load_torch_state_dict(sd)
    else:
        print(" > No encoder checkpoint given — using random init (smoke mode)")
        encoder = SpeakerEncoder(num_mels=config.audio.active.num_mels)
        mel0 = np.zeros((1, config.audio.active.num_mels, 80), np.float32)
        variables = encoder.init(jax.random.PRNGKey(0), mel0)

    # ONE fixed-shape compiled program: embed windows in batches of WB
    # ([WB, M, 80] in, [WB, E] out) and mean-pool on the host — exactly
    # the encoder's own semantics (per-window L2-normalize, mean over
    # windows), but without recompiling for every distinct utterance
    # length, which dominated extraction wall time.
    WB = 32
    W, S = encoder.window, encoder.stride
    apply_win = jax.jit(lambda mels: encoder.apply(variables, mels))
    files = sorted(glob(os.path.join(args.data_dir, args.glob_wav)))
    n_ok = n_short = 0
    for path in files:
        out_path = path.replace(args.glob_wav.replace("*", ""), "") + args.out_suffix
        wav = ap.load_wav(path)
        if args.encoder == "corentinj":
            # CorentinJ's frontend: LINEAR-power 40-band mel, 25 ms/10 ms
            from voicesplit_tpu.models.speaker_encoder import corentinj_mel

            mel = corentinj_mel(wav, ap.sample_rate)
        else:
            # bucketed: one compiled mel program per 1 s length bucket
            mel = np.asarray(ap.get_mel_bucketed(wav), np.float32)  # [n_mels, T]
        T = mel.shape[1]
        if T < W:
            # sentinel for too-short references (reference `:147-152`)
            np.save(out_path, np.array([0], np.float32))
            n_short += 1
            continue
        n_win = (T - W) // S + 1
        wins = np.stack([mel[:, s * S : s * S + W] for s in range(n_win)])
        parts = []
        for i in range(0, n_win, WB):
            chunk = wins[i : i + WB]
            valid = len(chunk)
            if valid < WB:
                chunk = np.concatenate(
                    [chunk, np.zeros((WB - valid, *chunk.shape[1:]), np.float32)]
                )
            parts.append(np.asarray(apply_win(chunk))[:valid])
        emb = np.concatenate(parts).mean(axis=0)
        if encoder.final_renorm:  # CorentinJ renorms the pooled embedding
            emb = emb / (np.linalg.norm(emb) + 1e-8)
        np.save(out_path, emb.astype(np.float32))
        n_ok += 1
    print(f"wrote {n_ok} embeddings ({n_short} sentinels) in {args.data_dir}")


if __name__ == "__main__":
    main()
