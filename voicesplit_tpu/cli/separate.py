"""Inference CLI: separate a target voice out of a mixture wav.

    python -m voicesplit_tpu.cli.separate --checkpoint_path ckpt.msgpack \
        --mixed_wav mix.wav (--emb emb.npy | --reference_wav ref.wav \
        --encoder_checkpoint embedder.pt) --output out.wav \
        [--streaming [--chunk_frames N]] [--griffin_lim]

Default inversion uses the mixture phase (reference eval behavior,
`utils/generic_utils.py:504`); ``--griffin_lim`` re-estimates phase.
``--streaming`` runs the chunked low-latency engine (requires a
checkpoint trained with a unidirectional LSTM).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Targeted voice separation")
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--mixed_wav", type=str, required=True)
    parser.add_argument("--emb", type=str, default=None, help="*.npy / *.pt d-vector")
    parser.add_argument("--reference_wav", type=str, default=None,
                        help="extract the d-vector from this wav instead")
    parser.add_argument("--encoder_checkpoint", type=str, default=None)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--streaming", action="store_true")
    parser.add_argument("--chunk_frames", type=int, default=50)
    parser.add_argument("--griffin_lim", action="store_true")
    parser.add_argument("--sequence_parallel", action="store_true",
                        help="shard the time axis over all devices "
                             "(long-form inference, parallel/sequence.py)")
    args = parser.parse_args(argv)

    from voicesplit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from voicesplit_tpu.config import load_config
    from voicesplit_tpu.data.dataset import _load_array
    from voicesplit_tpu.dsp.processor import make_audio_processor
    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train.checkpoint import config_from_checkpoint

    config = (
        load_config(args.config_path)
        if args.config_path
        else config_from_checkpoint(args.checkpoint_path)
    )
    ap = make_audio_processor(config)

    # --- d-vector ------------------------------------------------------
    if args.emb:
        emb = np.asarray(_load_array(args.emb), np.float32).reshape(1, -1)
    elif args.reference_wav:
        from voicesplit_tpu.models.speaker_encoder import (
            SpeakerEncoder,
            load_torch_state_dict,
        )

        p = config.audio.active
        # waveglow's config field is n_mel_channels (reference schema)
        encoder = SpeakerEncoder(
            num_mels=getattr(p, "num_mels", getattr(p, "n_mel_channels", 40))
        )
        if args.encoder_checkpoint:
            import torch

            sd = torch.load(args.encoder_checkpoint, map_location="cpu")
            enc_vars = load_torch_state_dict({k: v.numpy() for k, v in sd.items()})
        else:
            raise SystemExit("--reference_wav requires --encoder_checkpoint")
        mel = ap.get_mel(ap.load_wav(args.reference_wav))
        emb = np.asarray(encoder.apply(enc_vars, mel[None]), np.float32)
    else:
        raise SystemExit("provide --emb or --reference_wav")

    mixed = ap.load_wav(args.mixed_wav)

    from voicesplit_tpu.train.checkpoint import load_model_variables

    model = make_masknet(config, streaming=args.streaming)
    variables = load_model_variables(
        config, args.checkpoint_path, streaming=args.streaming
    )

    if args.streaming:
        from voicesplit_tpu.streaming import StreamingSeparator

        sep = StreamingSeparator(config, variables, chunk_frames=args.chunk_frames)
        out = sep.separate(mixed[None], emb)[0]
    elif args.sequence_parallel:
        from voicesplit_tpu.parallel.sequence import separate_long

        out = separate_long(config, variables, mixed, emb[0])
    else:
        spec, phase = ap.wav2spec(mixed)
        mask = model.apply(variables, spec[None], emb, train=False)
        est = np.asarray(mask[0]) * spec
        out = ap.spec2wav(est, None if args.griffin_lim else phase)

    ap.save_wav(out, args.output)
    print(f"wrote {args.output} ({len(out) / ap.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
