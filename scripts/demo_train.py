"""End-to-end convergence demo on the reference's committed demo audios.

Builds a speaker-per-directory corpus from the reference repo's
`datasets/LibriSpeech/audios_demo/clean/` wavs (the files Google shipped
with the VoiceFilter demo — real speech, one utterance + its normalized
variant per speaker), trains the flagship VoiceSplit + SI-SNR config on
fresh on-the-fly 2-speaker mixtures, and reports SI-SNRi (SI-SNR of the
separated estimate minus SI-SNR of the raw mixture, both against the
clean target) on a held-out batch before and after training.

This is the feasible in-round proxy for the reference's Exp-5 quality
run (SURVEY.md §6: ~2 weeks on 4×V100) — it demonstrates the whole
pipeline learns: STFT → mask net → iSTFT → SI-SNR loss → Adam on real
speech, on the TPU, with the production input pipeline.

Usage: PYTHONPATH=. python scripts/demo_train.py [--steps 300] [--out logs/demo]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEMO_CLEAN = "/root/reference/datasets/LibriSpeech/audios_demo/clean"
DEMO_REFERENCE = "/root/reference/datasets/LibriSpeech/audios_demo/reference"


def build_corpus(out_dir: str, corpus_dir: str | None = None) -> str:
    """``{clean,reference}/<spk>-<chap>-<utt>[-norm].wav`` →
    ``corpus/<spk>/<file>.wav`` (or into ``corpus_dir`` when given — a
    shared cache so fold campaigns reuse wav prep and pseudo-speaker
    generation; split selection filters by id afterwards, so a cached
    pseudo dir for a speaker some fold holds out is never drawn).

    ``reference/`` holds the demo's ENROLLMENT clips — a second distinct
    utterance for 10 of the 18 speakers (no new speakers).  Including
    them doubles those speakers' utterance diversity and, with the
    mixer's distinct-utterance-group enrollment rule, lets eval
    condition on a clip that is NOT the utterance being separated."""
    corpus = corpus_dir or os.path.join(out_dir, "corpus")
    os.makedirs(corpus, exist_ok=True)
    for src_dir in (DEMO_CLEAN, DEMO_REFERENCE):
        for f in sorted(os.listdir(src_dir)):
            if not f.endswith(".wav"):
                continue
            spk = f.split("-")[0]
            d = os.path.join(corpus, spk)
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(src_dir, f), dst)
    return corpus


def add_pseudo_speakers(corpus, train_ids, sample_rate, speed_factors=(),
                        pitch_semitones=(), vtlp_alphas=()):
    """Write perturbed copies of each train speaker as NEW speaker dirs —
    each perturbation is a distinct enrollment identity (the standard
    recipe for multiplying speaker diversity on tiny corpora; train-side
    only: held-out speakers keep zero exposure, direct or perturbed —
    their dirs are simply never passed in via ``train_ids``).

    Three orthogonal voice axes (round-2 bottleneck: too few
    IDENTITIES, encoder held-out EER 0.233 — docs/RESULTS.md):

    - ``<spk>~p090``: resampled playback (pitch+formants+tempo coupled)
    - ``<spk>~s+2.0``: pitch shift at CONSTANT tempo (dsp/augment.py)
    - ``<spk>~v110``: VTLP formant warp — timbre only, pitch untouched
    """
    from voicesplit_tpu.dsp.audio_io import load_wav, resample, save_wav

    jobs = []  # (dir tag, transform)
    for f in speed_factors:
        jobs.append((
            f"p{int(round(f * 100)):03d}",
            # playback-speed change: resample to sr/f, label as sr
            lambda wav, f=f: resample(wav, sample_rate, int(round(sample_rate / f))),
        ))
    if pitch_semitones or vtlp_alphas:
        from voicesplit_tpu.dsp.augment import pitch_shift, vtlp

        for st in pitch_semitones:
            jobs.append((
                f"s{st:+.1f}", lambda wav, st=st: pitch_shift(wav, sample_rate, st)
            ))
        for a in vtlp_alphas:
            jobs.append((
                f"v{int(round(a * 100)):03d}", lambda wav, a=a: vtlp(wav, sample_rate, a)
            ))
    for spk in sorted(train_ids):
        src_dir = os.path.join(corpus, spk)
        for tag, transform in jobs:
            dst_dir = os.path.join(corpus, f"{spk}~{tag}")
            os.makedirs(dst_dir, exist_ok=True)
            for w in sorted(os.listdir(src_dir)):
                if not w.endswith(".wav"):
                    continue
                dst = os.path.join(dst_dir, w)
                if os.path.exists(dst):
                    continue
                wav = load_wav(os.path.join(src_dir, w), sample_rate)
                save_wav(transform(wav), dst, sample_rate)


def encoder_grid_subset(speakers: dict, spec: str) -> dict:
    """Restrict a (post-augment) speaker pool to the pseudo-voice sub-grid
    named by ``spec`` ('pitch:<csv>;vtlp:<csv>;speed:<csv>'); base voices
    (no '~' tag) always stay in.  Tag scheme matches add_pseudo_speakers:
    p<speed*100>, s<+semitones>, v<alpha*100>."""
    allowed = set()
    for part in spec.split(";"):
        if not part.strip():
            continue
        axis, _, csv = part.partition(":")
        vals = [float(v) for v in csv.split(",") if v.strip()]
        if axis == "speed":
            allowed |= {f"p{int(round(f * 100)):03d}" for f in vals}
        elif axis == "pitch":
            allowed |= {f"s{st:+.1f}" for st in vals}
        elif axis == "vtlp":
            allowed |= {f"v{int(round(a * 100)):03d}" for a in vals}
        else:
            raise SystemExit(f"--encoder_grid: unknown axis {axis!r}")
    return {
        s: v for s, v in speakers.items()
        if "~" not in s or s.split("~", 1)[1] in allowed
    }


def main():
    ap_args = argparse.ArgumentParser()
    ap_args.add_argument("--steps", type=int, default=300)
    ap_args.add_argument("--batch_size", type=int, default=16)
    ap_args.add_argument("--lr", type=float, default=None,
                         help="override config learning rate (reference default 1e-2)")
    ap_args.add_argument("--lr_decay", action="store_true",
                         help="cosine-decay the lr to 5%% over the run (the "
                         "reference uses constant lr; decay stabilizes the "
                         "late-training eval noise on tiny corpora)")
    ap_args.add_argument("--emb", default="pseudo",
                         choices=("pseudo", "spectral", "ge2e"),
                         help="'spectral' = signal-derived d-vectors; 'ge2e' = "
                              "train a GE2E encoder on the (train-split) corpus "
                              "first and condition on its d-vectors — the full "
                              "reference pipeline in-framework (open-set capable)")
    ap_args.add_argument("--ge2e_steps", type=int, default=1500)
    ap_args.add_argument("--embeddings_file", type=str, default=None,
                         help="npz of per-speaker d-vectors from a previous "
                         "--emb ge2e run (skips encoder training; keeps the "
                         "conditioning space identical for warm-start runs)")
    ap_args.add_argument("--holdout", type=int, default=0,
                         help="hold out the last N speakers entirely for eval "
                              "(open-set: unseen speakers; requires --emb "
                              "spectral|ge2e and N >= 2)")
    ap_args.add_argument("--holdout_ids", type=str, default=None,
                         help="comma-separated speaker ids to hold out instead "
                         "of the last N — rotating leave-k-out folds")
    ap_args.add_argument("--causal", action="store_true",
                         help="train the deployable zero-lookahead model: "
                         "causal conv stack + unidirectional LSTM")
    ap_args.add_argument("--augment", action="store_true",
                         help="training-time augmentation: random crop offsets, "
                         "±5 dB mixing-SNR jitter, [−6,0] dB gain jitter, "
                         "0.9/1.0/1.1 speed perturb (eval stays unaugmented)")
    ap_args.add_argument("--speaker_augment", action="store_true",
                         help="multiply the TRAIN speaker pool with playback-"
                         "speed pseudo-speakers (distinct enrollment "
                         "identities; held-out speakers stay unexposed)")
    ap_args.add_argument("--speed_factors", type=str, default="0.9,1.1",
                         help="comma-separated speed factors for "
                         "--speaker_augment (each adds one pseudo-voice per "
                         "train speaker)")
    ap_args.add_argument("--pitch_semitones", type=str, default="",
                         help="comma-separated semitone shifts (e.g. '-2,2'): "
                         "constant-tempo pitch-shift pseudo-voices per train "
                         "speaker (needs --speaker_augment)")
    ap_args.add_argument("--vtlp_alphas", type=str, default="",
                         help="comma-separated VTLP warp factors (e.g. "
                         "'0.9,1.1'): formant-warp pseudo-voices per train "
                         "speaker (needs --speaker_augment)")
    ap_args.add_argument("--val_holdout_ids", type=str, default=None,
                         help="comma-separated speaker ids excluded from "
                         "training and used as the VALIDATION (checkpoint-"
                         "selection) stream — a dev/test speaker split: "
                         "selection sees unseen-speaker generalization while "
                         "the test --holdout_ids stay untouched. Measured "
                         "motive (fold 0 dense): held-out SI-SNRi peaks "
                         "+0.55 dB at step 1550 then decays to -0.55 by 5000 "
                         "while seen-speaker val keeps climbing — seen-val "
                         "selection systematically picks overfit steps.")
    ap_args.add_argument("--encoder_grid", type=str, default=None,
                         help="restrict the GE2E ENCODER's training identities "
                         "to this pseudo-voice sub-grid while the mask net "
                         "keeps the full --speaker_augment pool. Format "
                         "'pitch:<csv>;vtlp:<csv>;speed:<csv>' (omitted axes "
                         "keep no pseudo-voices on that axis; base voices "
                         "always included). Measured motive (fold 0): the "
                         "dense ±4 st grid helps mask-net diversity but "
                         "degrades encoder held-out EER 0.022 → 0.200 — the "
                         "two consumers want different grids.")
    ap_args.add_argument("--emb_noise", type=float, default=0.0,
                         help="train-time Gaussian noise std on d-vectors "
                         "(renormalized) so conditioning degrades gracefully "
                         "on imperfect embeddings; eval stays clean")
    ap_args.add_argument("--allow_short", action="store_true",
                         help="include speakers with <3 s utterances by placing "
                         "short sources in a zero bed (partial overlap); adds 5 "
                         "of the 18 demo speakers the strict rule excludes")
    ap_args.add_argument("--dropout", type=float, default=0.0,
                         help="mask-net dropout (LSTM input+output) — the "
                         "round-3 measured overfit is mask-net-side (held-out "
                         "curves regress while validation climbs); this and "
                         "the two flags below are the regularization levers")
    ap_args.add_argument("--weight_decay", type=float, default=0.0,
                         help="AdamW decoupled weight decay on matmul kernels")
    ap_args.add_argument("--spec_augment", type=str, default="",
                         help="'T,F' max widths (frames, freq bins) for "
                         "SpecAugment-style masking of the mask net's input "
                         "spec, train only (e.g. '24,40'); the estimate "
                         "still multiplies the clean mixture spec")
    ap_args.add_argument("--ema", type=float, default=0.0,
                         help="EMA decay for Polyak-averaged eval weights "
                         "(e.g. 0.99 ≈ 100-step window); 0 disables. "
                         "Validation selection and the held-out curve use "
                         "the averaged params — the cheap trajectory-side "
                         "lever against the peak-then-regress overfit")
    ap_args.add_argument("--lstm_dim", type=int, default=None,
                         help="LSTM hidden width override (reference: 400) — "
                         "the capacity lever: the BiLSTM holds 17.5M of the "
                         "19M params, and the open-set corpus has ~14 train "
                         "voices, so shrinking it attacks the measured "
                         "mask-net overfit from the model side rather than "
                         "the data side")
    ap_args.add_argument("--eval_batches", type=int, default=4,
                         help="held-out eval batches (B each) averaged per point")
    ap_args.add_argument("--eval_every", type=int, default=50,
                         help="steps between val/held-out curve points "
                         "(long runs: every-50 evals dominate wall time; "
                         "checkpoint selection resolution follows this)")
    ap_args.add_argument("--warm_start", type=str, default=None,
                         help="BiLSTM checkpoint to convert+seed a --causal run "
                         "(train/checkpoint.py::bilstm_to_streaming_sd)")
    ap_args.add_argument("--save_checkpoint", action="store_true",
                         help="save a checkpoint at the end of the run")
    ap_args.add_argument("--corpus_dir", default=None,
                         help="shared corpus cache dir: wav copies and "
                         "pseudo-speaker generation are reused across "
                         "runs/folds (identity selection still respects each "
                         "run's splits, so no cross-fold leakage)")
    ap_args.add_argument("--out", default="logs/demo_train")
    args = ap_args.parse_args()

    if args.holdout and args.emb == "pseudo":
        ap_args.error("--holdout needs --emb spectral|ge2e (pseudo d-vectors "
                      "are per-speaker identity tokens and cannot generalize)")
    if args.val_holdout_ids and not (args.holdout or args.holdout_ids):
        ap_args.error("--val_holdout_ids requires --holdout/--holdout_ids: "
                      "closed-set eval draws from EVERY mixable speaker, so "
                      "any val speaker would overlap the eval pool")

    import jax
    import jax.numpy as jnp

    from voicesplit_tpu.config import Config
    from voicesplit_tpu.data.online import OnlineMixIterator, discover_utterances
    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.losses import si_snr
    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    corpus = build_corpus(args.out, args.corpus_dir)
    # mixable = ≥3 s after trim (strict reference rule); with
    # --allow_short the TRAIN pool additionally gets short-utterance
    # speakers (zero-bed placement), while held-out EVAL speakers are
    # always drawn from the mixable set so the eval protocol (full 3 s
    # overlapped mixtures) stays comparable across runs
    mixable = discover_utterances(corpus, min_duration=3.0)
    speakers = (
        discover_utterances(corpus, min_duration=1.0) if args.allow_short else mixable
    )
    print(f"corpus: {len(speakers)} speakers ({len(mixable)} ≥3 s after trim)",
          flush=True)

    if args.holdout_ids and not args.holdout:
        args.holdout = len(args.holdout_ids.split(","))
    if args.holdout:
        mix_ids = sorted(mixable)
        if args.holdout < 2 or args.holdout > len(mix_ids) - 2:
            raise SystemExit(f"--holdout must be in [2, {len(mix_ids) - 2}]")
        if args.holdout_ids:
            eval_ids = args.holdout_ids.split(",")
            bad = [s for s in eval_ids if s not in mixable]
            if bad:
                raise SystemExit(f"--holdout_ids not in mixable set: {bad} "
                                 f"(mixable: {mix_ids})")
        else:
            eval_ids = mix_ids[-args.holdout:]
        # filter by BASE id: with a shared --corpus_dir the discovery can
        # see pseudo-speaker dirs (spk~tag) cached by a previous fold for
        # a speaker THIS run holds out — those are warped copies of the
        # held-out voice and must never reach the train pool
        eval_base = set(eval_ids)
        train_speakers = {
            s: v for s, v in speakers.items()
            if s.split("~")[0] not in eval_base
        }
        eval_speakers = {s: mixable[s] for s in eval_ids}
        print(f"open-set split: train {len(train_speakers)} / "
              f"held-out {eval_ids}", flush=True)
    else:
        train_speakers = speakers
        eval_speakers = mixable  # eval always mixes strictly (full 3 s)
    # the closed-set VALIDATION stream mixes strictly (full 3 s overlap,
    # no zero-bed), so it must draw only from ≥3 s speakers even when
    # --allow_short widens the TRAIN pool — otherwise a short-speaker
    # draw exhausts the mixer's retries
    if args.val_holdout_ids:
        if not args.holdout:
            # closed-set eval_speakers is the whole mixable pool, so the
            # clash check below would always fire with a misleading
            # "overlap the test holdout" message — name the real problem
            raise SystemExit(
                "--val_holdout_ids requires --holdout/--holdout_ids: a "
                "dev-speaker selection split only makes sense against an "
                "open-set test holdout")
        val_ids = args.val_holdout_ids.split(",")
        bad = [s for s in val_ids if s not in mixable]
        if bad:
            raise SystemExit(f"--val_holdout_ids not in mixable set: {bad}")
        clash = set(val_ids) & set(eval_speakers)
        if clash:
            raise SystemExit(
                f"--val_holdout_ids overlap the test holdout: {sorted(clash)}"
            )
        train_speakers = {
            s: v for s, v in train_speakers.items()
            if s.split("~")[0] not in set(val_ids)
        }
        val_speakers = {s: mixable[s] for s in val_ids}
        print(f"val-holdout split: train {len(train_speakers)} / "
              f"val-unseen {val_ids}", flush=True)
    else:
        val_speakers = {s: mixable[s] for s in train_speakers if s in mixable}

    c = Config()  # flagship: voicesplit + si_snr
    c.train_config.batch_size = args.batch_size
    if args.lr is not None:
        c.train_config.learning_rate = args.lr
    if args.lr_decay:
        c.train_config.lr_decay_steps = args.steps
    c.model.causal = args.causal
    if args.dropout:
        c.model.dropout = args.dropout
    if args.lstm_dim is not None:
        c.model.lstm_dim = args.lstm_dim
    if args.weight_decay:
        c.train_config.weight_decay = args.weight_decay
    if args.spec_augment:
        t_w, f_w = (int(v) for v in args.spec_augment.split(","))
        c.train_config.spec_aug_time = t_w
        c.train_config.spec_aug_freq = f_w
    ap = AudioProcessor(c.audio)
    # the reference-default lr=1e-2 plateaus from scratch at B=16 (loss
    # stuck ~20, grad_norm ~1e-17) — every recorded demo number used 1e-3
    print(f"lr={c.train_config.learning_rate}"
          + ("  (NOTE: 1e-2 is known to plateau here; use --lr 1e-3)"
             if c.train_config.learning_rate >= 1e-2 else ""), flush=True)

    if args.speaker_augment:
        base_ids = sorted(s for s in train_speakers if "~" not in s)
        factors = tuple(
            float(f) for f in args.speed_factors.split(",") if f.strip()
        )
        semis = tuple(
            float(s) for s in args.pitch_semitones.split(",") if s.strip()
        )
        alphas = tuple(
            float(a) for a in args.vtlp_alphas.split(",") if a.strip()
        )
        add_pseudo_speakers(corpus, base_ids, ap.sample_rate,
                            speed_factors=factors, pitch_semitones=semis,
                            vtlp_alphas=alphas)
        rediscovered = discover_utterances(
            corpus, min_duration=(1.0 if args.allow_short else 3.0)
        )
        train_speakers = {
            s: v for s, v in rediscovered.items()
            if s.split("~")[0] in set(base_ids)
        }
        print(f"speaker augment: train pool {len(base_ids)} → "
              f"{len(train_speakers)} identities", flush=True)

    embeddings = None
    encoder_eer = None
    emb_mode_iter = args.emb
    if args.embeddings_file:
        import numpy as _np

        blob = _np.load(args.embeddings_file)
        embeddings = {k: blob[k].astype(_np.float32) for k in blob.files}
        print(f"loaded {len(embeddings)} enrollment d-vectors from "
              f"{args.embeddings_file}", flush=True)
        # Any identity the iterators can draw MUST be covered: a miss
        # silently falls back to a hash-seeded random embedding in
        # OnlineMixIterator._embedding, corrupting d-vector conditioning
        # (e.g. embeddings.npz written before --speaker_augment /
        # --speed_factors / --holdout_ids changed the identity pool).
        missing = sorted(
            (set(train_speakers) | set(eval_speakers) | set(val_speakers))
            - set(embeddings)
        )
        if missing:
            raise SystemExit(
                f"--embeddings_file {args.embeddings_file} lacks d-vectors "
                f"for {len(missing)} identities the run would draw: "
                f"{missing[:10]}{' ...' if len(missing) > 10 else ''} — "
                "re-extract embeddings with the same augmentation/holdout "
                "flags as this run."
            )
        emb_mode_iter = "pseudo"  # dict hits take precedence
    elif args.emb == "ge2e":
        # Full in-framework pipeline: train a GE2E encoder on the
        # TRAIN-split speakers only (held-out speakers stay unseen —
        # their d-vectors below are pure inference), then enroll every
        # speaker as the mean d-vector over their utterances.
        from voicesplit_tpu.train.encoder import embed_utterance, train_ge2e

        enc_speakers = train_speakers
        if args.encoder_grid is not None:
            enc_speakers = encoder_grid_subset(train_speakers,
                                               args.encoder_grid)
            print(f"encoder grid: {len(enc_speakers)} of "
                  f"{len(train_speakers)} identities", flush=True)
        n_enc = min(8, len(enc_speakers))
        print(f"training GE2E encoder on {len(enc_speakers)} speakers "
              f"({args.ge2e_steps} steps, N={n_enc} M=4)...", flush=True)
        enc, enc_params, _, enc_losses = train_ge2e(
            ap, enc_speakers, n_speakers=n_enc, m_utts=4,
            steps=args.ge2e_steps, lr=3e-4,
            lstm_hidden=256, lstm_layers=2, emb_dim=c.model.emb_dim,
            seed=7, log_interval=max(50, args.ge2e_steps // 10),
        )
        import numpy as _np

        embeddings = {}
        # enroll EVERY identity the iterators can draw — train identities
        # including speed-perturbed pseudo-speakers (a pseudo id missing
        # here would silently fall back to a random identity token and
        # break d-vector-space conditioning) and held-out speakers (pure
        # inference; their wavs never touched encoder training)
        enroll = dict(train_speakers)
        for s, v in eval_speakers.items():
            enroll.setdefault(s, v)
        for s, v in val_speakers.items():
            enroll.setdefault(s, v)  # no-op unless --val_holdout_ids
        for spk, paths in enroll.items():
            vs = [embed_utterance(enc, enc_params, ap, ap.load_wav(p))
                  for p in paths[:4]]
            v = _np.mean(_np.stack(vs), axis=0)
            embeddings[spk] = (v / (_np.linalg.norm(v) + 1e-8)).astype(_np.float32)
        from voicesplit_tpu.losses.ge2e import pairwise_eer_stats

        utt_embs, utt_ids = [], []
        for spk, paths in enroll.items():
            for p in paths[:3]:
                utt_embs.append(embed_utterance(enc, enc_params, ap, ap.load_wav(p)))
                utt_ids.append(spk)
        utt_embs = _np.stack(utt_embs)

        def eer_subset(which_ids):
            idx = [i for i, s in enumerate(utt_ids) if s in which_ids]
            if not idx or len(idx) == len(utt_ids):
                return None, idx
            st = pairwise_eer_stats(
                utt_embs[idx], [utt_ids[i] for i in idx])
            return st, idx

        stats_all = pairwise_eer_stats(utt_embs, utt_ids)
        msg = (f"GE2E encoder: final loss {enc_losses[-1]:.3f}, "
               f"all-identity pairwise EER {stats_all['eer']:.3f} "
               f"(n_trials {stats_all['n_trials']}, "
               f"95% CI {stats_all.get('ci95')})")
        # scalar keys keep round-3 report compatibility; *_stats carry
        # the trial counts + bootstrap CI an EER claim needs at this n
        encoder_eer = {"all_identity": round(float(stats_all["eer"]), 4),
                       "all_identity_stats": stats_all}
        held = set(eval_speakers) - set(train_speakers)
        stats_ho, unseen_idx = eer_subset(held)
        if stats_ho is not None:
            msg += (f", held-out-only EER {stats_ho['eer']:.3f} "
                    f"(n_trials {stats_ho['n_trials']}, "
                    f"95% CI {stats_ho.get('ci95')})")
            encoder_eer["held_out_only"] = round(float(stats_ho["eer"]), 4)
            encoder_eer["held_out_only_stats"] = stats_ho
        # val-holdout speakers are equally unseen by the encoder: fold
        # them in for the larger-n unseen estimate (test pool alone is
        # ~4 speakers -> dozens of trials)
        unseen_all = (set(eval_speakers) | set(val_speakers)) - set(train_speakers)
        if unseen_all - held:
            stats_un, _ = eer_subset(unseen_all)
            if stats_un is not None:
                msg += (f", unseen-incl-val EER {stats_un['eer']:.3f} "
                        f"(n_trials {stats_un['n_trials']})")
                encoder_eer["unseen_incl_val"] = round(float(stats_un["eer"]), 4)
                encoder_eer["unseen_incl_val_stats"] = stats_un

        # POWERED unseen-speaker EER (round-4 weak #4: the whole-
        # utterance pools give ~40-60 trials, CI [0.00, 0.42] — too
        # underpowered to steer, and their only target trials are the
        # trivial x.wav-vs-x-norm.wav duplicate pairs).  Score
        # NON-OVERLAPPING encoder windows (0.8 s each) instead of one
        # mean d-vector per utterance: same material, ~30× the trials.
        # Honesty guards: the -norm renormalization of a capture is
        # DROPPED (aligned duplicate, not new evidence); time-disjoint
        # windows of one recording DO form trials (most demo speakers
        # have a single recording — a strict cross-session protocol
        # has zero target trials here, and same-session enrollment is
        # the condition the mixer actually runs under); the bootstrap
        # CI clusters by source recording — see
        # pairwise_eer_stats(groups=..., exclude_within_group=False).
        from voicesplit_tpu.train.encoder import embed_utterance_windows

        def eer_windows(which_ids):
            embs, spk_ids, grp = [], [], []
            for spk in sorted(which_ids):
                # one variant per BASE recording: prefer x.wav, drop its
                # x-norm.wav duplicate (same capture renormalized)
                by_base = {}
                for p in sorted(enroll[spk]):
                    b = os.path.splitext(os.path.basename(p))[0]
                    norm = b.endswith("-norm")
                    if norm:
                        b = b[: -len("-norm")]
                    if b not in by_base or not norm:
                        by_base[b] = p
                for b, p in sorted(by_base.items()):
                    w = embed_utterance_windows(
                        enc, enc_params, ap, ap.load_wav(p), stride=enc.window)
                    embs.append(w)
                    spk_ids += [spk] * len(w)
                    grp += [b] * len(w)
            if len(set(spk_ids)) < 2:
                return None
            return pairwise_eer_stats(_np.concatenate(embs), spk_ids,
                                      groups=grp, exclude_within_group=False)

        if held:
            stats_how = eer_windows(held)
            if stats_how is not None:
                msg += (f"\n  powered held-out window EER "
                        f"{stats_how['eer']:.3f} "
                        f"(n_trials {stats_how['n_trials']}, "
                        f"{stats_how['n_groups']} recordings, "
                        f"95% CI {stats_how.get('ci95')})")
                encoder_eer["held_out_windows_stats"] = stats_how
        if unseen_all - held:
            stats_unw = eer_windows(unseen_all)
            if stats_unw is not None:
                msg += (f"\n  powered unseen-incl-val window EER "
                        f"{stats_unw['eer']:.3f} "
                        f"(n_trials {stats_unw['n_trials']}, "
                        f"{stats_unw['n_groups']} recordings, "
                        f"95% CI {stats_unw.get('ci95')})")
                encoder_eer["unseen_incl_val_windows_stats"] = stats_unw
        print(msg, flush=True)
        emb_mode_iter = "pseudo"  # dict hits take precedence; no fallback used

    model = make_masknet(c, streaming=args.causal)
    tx = make_optimizer(c)
    B = args.batch_size
    L = int(ap.sample_rate * c.audio.audio_len)
    T = ap.frames_for(L)

    state = create_train_state(c, model, jax.random.PRNGKey(0), (B, T, ap.num_freq), tx)
    if args.warm_start:
        if not args.causal:
            raise SystemExit("--warm_start seeds the causal model; add --causal")
        import flax.serialization

        from voicesplit_tpu.train.checkpoint import bilstm_to_streaming_sd
        from voicesplit_tpu.train.checkpoint import load_checkpoint as _load_ckpt

        payload = _load_ckpt(args.warm_start)
        sd = bilstm_to_streaming_sd(payload["model"], c.model.lstm_dim)
        params = flax.serialization.from_state_dict(state.params, sd)
        bstats = flax.serialization.from_state_dict(
            state.batch_stats, payload["batch_stats"]
        )
        state = state.replace(params=params, batch_stats=bstats,
                              opt_state=tx.init(params))
        print(f"warm-started causal model from BiLSTM ckpt {args.warm_start}",
              flush=True)
    train_step = make_train_step(c, model, ap, tx)
    eval_step = make_eval_step(c, model, ap)

    train_it = OnlineMixIterator(
        train_speakers, batch_size=B, sample_rate=ap.sample_rate,
        audio_len=c.audio.audio_len, seed=17, items_per_epoch=256,
        emb_mode=emb_mode_iter, embeddings=embeddings,
        augment=args.augment, allow_short=args.allow_short,
        emb_noise=args.emb_noise,
    )
    # held-out mixtures: disjoint speakers with --holdout (open-set),
    # otherwise a different seed ⇒ different pairings/crops (closed-set).
    # Eval is NEVER augmented and never short-padded.
    eval_it = OnlineMixIterator(
        eval_speakers, batch_size=B, sample_rate=ap.sample_rate,
        audio_len=c.audio.audio_len, seed=977, items_per_epoch=256,
        emb_mode=emb_mode_iter, embeddings=embeddings,
    )
    eval_batches = [
        {k: jax.device_put(v) for k, v in next(eval_it).items()}
        for _ in range(max(1, args.eval_batches))
    ]
    # VALIDATION stream — the model-selection criterion.  Default:
    # train speakers with a disjoint mixing seed (the reference's role
    # for its VCTK dev set, `test_all_checkpoints.py`).  With
    # --val_holdout_ids: a dev-speaker split — selection sees
    # unseen-voice generalization while the TEST holdout stays
    # untouched.  Either way the test speakers never pick the step.
    val_it = OnlineMixIterator(
        val_speakers, batch_size=B, sample_rate=ap.sample_rate,
        audio_len=c.audio.audio_len, seed=51423, items_per_epoch=256,
        emb_mode=emb_mode_iter, embeddings=embeddings,
    )
    val_batches = [
        {k: jax.device_put(v) for k, v in next(val_it).items()}
        for _ in range(max(1, args.eval_batches))
    ]

    def si_snri_on(batches, params, batch_stats):
        vals = []
        for eval_batch in batches:
            m = eval_step(params, batch_stats, eval_batch)
            est = m["si_snr"]  # SI-SNR(est, target) [B]
            L_eval = eval_batch["target_wav"].shape[-1]
            base = si_snr(eval_batch["mixed_wav"][..., :L_eval],
                          eval_batch["target_wav"])
            vals.append(jax.device_get(jnp.mean(est - base)))
        return float(np.mean(vals))

    def si_snri(params, batch_stats):
        return si_snri_on(eval_batches, params, batch_stats)

    snri_0 = si_snri(state.params, state.batch_stats)
    print(f"step 0: held-out SI-SNRi {snri_0:+.3f} dB", flush=True)

    from voicesplit_tpu.data.prefetch import DevicePrefetcher

    curve = []
    best = {"val_si_snri_db": -np.inf}
    best_snapshot = None  # (step, params, batch_stats) at best-val
    t0 = time.time()
    prefetch = DevicePrefetcher(train_it, depth=3)
    ema_params = None
    if args.ema:
        from voicesplit_tpu.train import make_ema_update

        ema_update = make_ema_update(args.ema)
        # deep copy: train_step donates state buffers, so aliasing
        # state.params here would hand the EMA deleted arrays on step 1
        ema_params = jax.tree.map(jnp.copy, state.params)
    for step in range(1, args.steps + 1):
        batch = next(prefetch)
        state, metrics = train_step(state, batch)
        if ema_params is not None:
            ema_params = ema_update(ema_params, state.params)
        if step % args.eval_every == 0 or step == args.steps:
            m = jax.device_get(metrics)
            loss, gn = float(m["loss"]), float(m["grad_norm"])
            eval_params = ema_params if ema_params is not None else state.params
            snri = si_snri(eval_params, state.batch_stats)
            val = si_snri_on(val_batches, eval_params, state.batch_stats)
            point = {"step": step, "loss": loss, "si_snri_db": snri,
                     "val_si_snri_db": val, "grad_norm": gn}
            curve.append(point)
            if val > best["val_si_snri_db"]:
                best = point
                if args.save_checkpoint:
                    # device-side copies (cheap): the final state under
                    # the measured overfit is the WORST artifact; keep
                    # what validation actually selected
                    best_snapshot = (
                        step,
                        jax.tree.map(jnp.copy, eval_params),
                        jax.tree.map(jnp.copy, state.batch_stats),
                    )
            print(f"step {step}: loss {loss:+.3f}  grad_norm {gn:8.2f}  "
                  f"val SI-SNRi {val:+.3f}  held-out SI-SNRi {snri:+.3f} dB",
                  flush=True)
    dt = time.time() - t0

    if args.save_checkpoint:
        from voicesplit_tpu.train.checkpoint import save_checkpoint

        if ema_params is not None:
            # the curve/selection was computed on the averaged weights;
            # the checkpoint must hold what was evaluated
            state = state.replace(params=ema_params)
        ckpt_path = save_checkpoint(args.out, state, c)
        print(f"checkpoint → {ckpt_path}", flush=True)
        if best_snapshot is not None and best_snapshot[0] != int(
            jax.device_get(state.step)
        ):
            b_step, b_params, b_bstats = best_snapshot
            # NB: carries the FINAL optimizer state (eval/deploy
            # artifact, not a resume point for exact reproduction)
            best_state = state.replace(
                params=b_params, batch_stats=b_bstats,
                step=jnp.asarray(b_step, dtype=jnp.int32),
            )
            best_path = save_checkpoint(args.out, best_state, c)
            print(f"best-val checkpoint (step {b_step}) → {best_path}",
                  flush=True)
        if embeddings:
            emb_path = os.path.join(args.out, "embeddings.npz")
            np.savez(emb_path, **embeddings)
            print(f"enrollment d-vectors → {emb_path}", flush=True)

    report = {
        "config": "voicesplit + si_snr (flagship)"
        + (" causal+uniLSTM" if args.causal else "")
        + (" +augment" if args.augment else "")
        + (" +speaker_augment" if args.speaker_augment else "")
        + (f" +pitch[{args.pitch_semitones}]" if args.pitch_semitones else "")
        + (f" +vtlp[{args.vtlp_alphas}]" if args.vtlp_alphas else "")
        + (f" +enc_grid[{args.encoder_grid}]" if args.encoder_grid else "")
        + (f" +val_holdout[{args.val_holdout_ids}]"
           if args.val_holdout_ids else "")
        + (f" +emb_noise{args.emb_noise}" if args.emb_noise else "")
        + (f" +dropout{args.dropout}" if args.dropout else "")
        + (f" +lstm{args.lstm_dim}" if args.lstm_dim is not None else "")
        + (f" +ema{args.ema}" if args.ema else "")
        + (f" +wd{args.weight_decay}" if args.weight_decay else "")
        + (f" +specaug[{args.spec_augment}]" if args.spec_augment else "")
        + (" +allow_short" if args.allow_short else "")
        + (" warm_start" if args.warm_start else ""),
        "emb_mode": args.emb,
        "encoder_eer": encoder_eer,
        "eval_mixtures": len(eval_batches) * B,
        "eval_protocol": (
            f"open-set: {args.holdout} held-out speakers" if args.holdout
            else "closed-set: unseen pairings/crops, same speakers"
        ),
        "val_protocol": (
            f"val-unseen speakers {args.val_holdout_ids} (dev/test split)"
            if args.val_holdout_ids
            else "train speakers, disjoint mixing seed"
        ),
        "n_speakers": len(speakers),
        "steps": args.steps,
        "batch_size": B,
        "si_snri_start_db": snri_0,
        "si_snri_end_db": curve[-1]["si_snri_db"],
        # the number to QUOTE: held-out SI-SNRi at the best-validation
        # step (validation per val_protocol above: train speakers with
        # an unseen mixing seed by default, or the --val_holdout_ids
        # dev-speaker split — never the test set)
        "si_snri_at_best_val_db": best["si_snri_db"],
        "best_val_step": best["step"],
        "best_val_si_snri_db": best["val_si_snri_db"],
        # diagnostic upper bound ONLY (selecting on it would leak the
        # test speakers into checkpoint selection): the held-out curve's
        # peak, vs what val-based selection actually captured
        "si_snri_heldout_peak_db": max(p["si_snri_db"] for p in curve),
        "heldout_peak_step": max(curve, key=lambda p: p["si_snri_db"])["step"],
        "curve": curve,
        "wall_s": round(dt, 1),
        "audio_s_per_s": round(B * c.audio.audio_len * args.steps / dt, 1),
    }
    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report → {path}", flush=True)
    print(json.dumps({k: v for k, v in report.items() if k != "curve"}), flush=True)


if __name__ == "__main__":
    main()
