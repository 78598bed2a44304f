"""GE2E softmax loss (Wan et al. 2018, arXiv:1710.10467 §2.1).

The reference conditions its mask net on d-vectors from a GE2E encoder
that was trained OUTSIDE the repo (the external ``embedder.pt``;
notebook `GE2E-...-openvoicefilter.py` only runs inference).  This
module provides the training objective so the encoder can be trained
end-to-end inside this framework (`cli/train_encoder.py`), removing the
last external-artifact dependency.

Batch layout: ``emb [N, M, D]`` — N speakers x M utterances, each
already L2-normalized (the `SpeakerEncoder` output).  Per-utterance
similarity against every speaker centroid, with the OWN-speaker
centroid computed excluding the utterance itself (eq. 8-9); scaled by
learnable ``(w, b)`` with w kept positive (eq. 5); softmax loss
(eq. 6/10).  Fully vectorized — no python loops over speakers.
"""

from __future__ import annotations

import jax.numpy as jnp


def ge2e_softmax_loss(emb: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean GE2E softmax loss over the [N, M] utterances.

    ``emb`` must be L2-normalized along D.  ``w``/``b`` are scalar
    (0-d or [1]) learnable similarity scale/bias; w is clamped positive
    inside the loss (the paper constrains w > 0).
    """
    N, M, D = emb.shape
    if N < 2 or M < 2:
        raise ValueError("GE2E needs >=2 speakers and >=2 utterances each")
    w = jnp.maximum(jnp.reshape(w, ()), 1e-4)
    b = jnp.reshape(b, ())

    cent = emb.mean(axis=1)  # [N, D]
    cent = cent / (jnp.linalg.norm(cent, axis=-1, keepdims=True) + 1e-8)
    # exclusive own centroid per utterance (eq. 9)
    excl = (emb.sum(axis=1, keepdims=True) - emb) / (M - 1)  # [N, M, D]
    excl = excl / (jnp.linalg.norm(excl, axis=-1, keepdims=True) + 1e-8)

    sim = jnp.einsum("nmd,kd->nmk", emb, cent)  # cos: emb is unit-norm
    own = jnp.einsum("nmd,nmd->nm", emb, excl)
    eye = jnp.eye(N, dtype=bool)[:, None, :]  # [N, 1, N]
    sim = jnp.where(eye, own[:, :, None], sim)
    logits = w * sim + b  # [N, M, N]

    target = logits[
        jnp.arange(N)[:, None], jnp.arange(M)[None, :], jnp.arange(N)[:, None]
    ]
    lse = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)), -1)) + (
        logits.max(-1)
    )
    return jnp.mean(lse - target)


def _eer_from_pairs(s, same) -> float:
    """EER from scored pairs: ``s [P]`` cosine scores, ``same [P]`` bool."""
    import numpy as np

    if not same.any() or same.all():
        return float("nan")
    order = np.argsort(-s)
    same_sorted = same[order]
    n_same = same.sum()
    n_diff = (~same).sum()
    # sweep thresholds: FA = diff accepted / n_diff, FR = same rejected / n_same
    tp = np.cumsum(same_sorted)
    fp = np.cumsum(~same_sorted)
    fa = fp / n_diff
    fr = 1.0 - tp / n_same
    k = int(np.argmin(np.abs(fa - fr)))
    return float((fa[k] + fr[k]) / 2.0)


def pairwise_eer(emb: "jnp.ndarray", speaker_ids) -> float:
    """Equal error rate of cosine utterance-pair verification (host).

    ``emb [K, D]`` L2-normalized, ``speaker_ids [K]``.  All K*(K-1)/2
    pairs are scored by cosine; EER is where false-accept == false-
    reject.  Used as the encoder-training progress metric.
    """
    import numpy as np

    e = np.asarray(emb, np.float64)
    ids = np.asarray(speaker_ids)
    scores = e @ e.T
    iu = np.triu_indices(len(ids), k=1)
    return _eer_from_pairs(scores[iu], ids[iu[0]] == ids[iu[1]])


def pairwise_eer_stats(emb: "jnp.ndarray", speaker_ids, n_boot: int = 1000,
                       seed: int = 0, groups=None,
                       exclude_within_group: bool = True) -> dict:
    """`pairwise_eer` plus the statistics an EER claim needs at small n.

    Returns ``{eer, n_utts, n_trials, n_target, n_nontarget,
    ci95: [lo, hi]}``.  The 95% CI is a percentile bootstrap resampling
    UTTERANCES with replacement (utterances, not pairs, are the unit of
    dependence — every pair sharing an utterance is correlated), with
    the full K×K score matrix computed once and sliced per resample.
    Resamples that yield no target or no non-target pair are redrawn.
    On the demo corpus's ~4-held-out-speaker pools the trial counts are
    tiny (dozens of pairs), so an unqualified "EER 0.000" is not
    meaningful — report ``n_trials`` and ``ci95`` with it.

    ``groups`` (optional, [K]) marks each row's dependence cluster —
    e.g. the source-recording when the rows are SLIDING-WINDOW
    d-vectors rather than whole-utterance means (the round-4 held-out
    pools were ~55 trials, CI [0.00, 0.42] — unusable; windowing the
    same material multiplies trials ~30×).  With groups set:

    - the bootstrap resamples GROUPS, not rows (cluster bootstrap —
      windows of one recording rise and fall together, so resampling
      windows independently would shrink the CI dishonestly);
    - ``exclude_within_group`` controls whether two windows of one
      recording may form a trial.  True drops them (strict cross-
      session protocol).  False keeps them — REQUIRED on a corpus
      whose speakers have a single recording each (this one: most
      demo speakers), where a strict protocol has ZERO target trials
      and the EER is NaN; time-disjoint windows of one recording
      differ in content but share session/channel, so the resulting
      EER is a SAME-SESSION verification number (the condition the
      mixer's enrollment actually runs under) — the caveat travels in
      ``within_group_trials`` and ``n_target_cross_group``;
    - ``n_utts`` still counts rows; ``n_groups`` counts clusters.

    Callers must not feed duplicate captures of one signal as separate
    groups (e.g. x.wav and its x-norm.wav renormalization) — dedupe to
    one variant first, or aligned duplicates become fake target trials.
    """
    import numpy as np

    e = np.asarray(emb, np.float64)
    ids = np.asarray(speaker_ids)
    K = len(ids)
    scores = e @ e.T
    iu = np.triu_indices(K, k=1)
    same_full = ids[iu[0]] == ids[iu[1]]
    rng = np.random.default_rng(seed)
    boots = []
    attempts = 0
    if groups is None:
        out = {
            "eer": _eer_from_pairs(scores[iu], same_full),
            "n_utts": int(K),
            "n_trials": int(same_full.size),
            "n_target": int(same_full.sum()),
            "n_nontarget": int((~same_full).sum()),
        }
        while len(boots) < n_boot and attempts < 4 * n_boot:
            attempts += 1
            idx = rng.integers(0, K, size=K)
            sub = scores[np.ix_(idx, idx)]
            bi = np.triu_indices(K, k=1)
            same = ids[idx][bi[0]] == ids[idx][bi[1]]
            v = _eer_from_pairs(sub[bi], same)
            if v == v:  # not NaN (resample had both pair kinds)
                boots.append(v)
    else:
        _, grp = np.unique(np.asarray(groups), return_inverse=True)
        within = grp[iu[0]] == grp[iu[1]]
        keep0 = ~within if exclude_within_group else np.ones_like(within)
        same_kept = same_full[keep0]
        out = {
            "eer": _eer_from_pairs(scores[iu][keep0], same_kept),
            "n_utts": int(K),
            "n_groups": int(grp.max() + 1),
            "n_trials": int(same_kept.size),
            "n_target": int(same_kept.sum()),
            "n_nontarget": int((~same_kept).sum()),
            "n_target_cross_group": int((same_full & ~within).sum()),
            "within_group_trials": not exclude_within_group,
        }
        members = [np.flatnonzero(grp == g) for g in range(int(grp.max()) + 1)]
        G = len(members)
        while len(boots) < n_boot and attempts < 4 * n_boot:
            attempts += 1
            draw = rng.integers(0, G, size=G)
            idx = np.concatenate([members[d] for d in draw])
            gs = grp[idx]  # underlying cluster id per resampled row
            sub = scores[np.ix_(idx, idx)]
            bi = np.triu_indices(len(idx), k=1)
            if exclude_within_group:
                # two copies of one drawn cluster must not pair either —
                # exclusion is by underlying cluster id, not draw slot
                keep = gs[bi[0]] != gs[bi[1]]
            else:
                # within-cluster pairs are trials, but a row must never
                # score against its own duplicate from a repeated draw
                keep = idx[bi[0]] != idx[bi[1]]
            same = (ids[idx][bi[0]] == ids[idx][bi[1]])[keep]
            v = _eer_from_pairs(sub[bi][keep], same)
            if v == v:
                boots.append(v)
    if boots:
        lo, hi = np.percentile(boots, [2.5, 97.5])
        out["ci95"] = [round(float(lo), 4), round(float(hi), 4)]
        out["n_boot"] = len(boots)
    return out
