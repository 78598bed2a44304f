"""Sequence-parallel long-form separation (exact, offline).

The reference is bounded to fixed 3 s clips (`config.json:46`,
`utils/generic_utils.py:313-321`); SURVEY.md §5's "long-context /
sequence parallelism" row is **absent** there.  This module introduces
it the TPU way: the TIME axis of one long utterance is sharded over a
mesh axis ``seq`` with `jax.shard_map`, so an utterance K× too big for
one chip's HBM (the conv stack holds ≈75 KB/frame of bf16 activations)
separates in ONE jitted call over K chips — with output bit-for-bit
matching the single-device full-sequence pass:

- **Conv stack** — each shard runs the stack on its ``[B, Tc, F]`` slice
  plus halo frames from its neighbours (`lax.ppermute`, ±conv_context);
  terminal shards receive zeros, which is exactly what the full-sequence
  SAME convs pad with, so the sliced-out middle frames are exact (the
  same windowed-equivalence the streaming engine relies on,
  `tests/test_streaming.py::test_windowed_conv_features_match_full_pass`).
- **BiLSTM** — the FLOPs (the 5064-wide input projection, the fc head)
  are shard-local and K-way parallel.  The tiny ``h @ W_hh`` recurrence
  is a true data-dependence chain, so it is made exact by K-1 *carry
  relay* rounds: every round each shard scans its local frames from its
  latest incoming carry and ppermutes its final ``(h, c)`` to the next
  shard; after round r every shard d ≤ r holds the true full-sequence
  carry (shard 0's zero carry is correct by definition), so K-1 rounds
  + 1 output scan make every shard exact.  The forward chain relays
  left→right and the reverse chain right→left in the same rounds.
  Recurrence wall-clock equals the unsharded scan — the chain cannot be
  parallelized without changing the math — but it is ~3 % of step time;
  everything else scales with K, and per-chip activation memory drops
  by K, which is what caps single-chip utterance length.

No reference design to mirror (SURVEY.md §2.9): this is a capability the
new framework introduces, like DP/TP in `parallel/sharding.py`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voicesplit_tpu.config import Config
from voicesplit_tpu.models.lstm import lstm_scan
from voicesplit_tpu.models.masknet import MaskNet


def make_seq_mesh(n_shards: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D ``("seq",)`` mesh over `devices` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_shards is not None:
        devices = devices[:n_shards]
    return Mesh(np.asarray(devices), ("seq",))


def _relay_scan(
    xp: jnp.ndarray,  # [B, Tc, 4H] local pre-projected gates
    w_hh: jnp.ndarray,  # [H, 4H]
    n_shards: int,
    axis: str,
    reverse: bool,
    frame_mask: Optional[jnp.ndarray] = None,  # [Tc] or [B, Tc]
) -> jnp.ndarray:
    """Exact LSTM outputs for this shard of a sequence-sharded scan.

    K-1 carry-relay rounds (local scan + ppermute of the final carry to
    the next shard in chain order) then one output scan.  ppermute has
    no wraparound edge, so the chain-head shard keeps receiving the
    zero carry — the correct full-sequence initial state.  `frame_mask`
    marks alignment-padding frames, which the carry skips over — without
    it the reverse chain would start inside the padded tail and hand a
    perturbed state to the real frames."""
    B, _, four_h = xp.shape
    H = four_h // 4
    # the zero carry is created inside the shard_map body, so it types as
    # unvarying; the scan carry becomes seq-varying — pcast up front
    zero = jax.lax.pcast(jnp.zeros((B, H), xp.dtype), axis, to="varying")
    zeros = (zero, zero)
    if n_shards == 1:
        out, _ = lstm_scan(xp, w_hh, zeros[0], zeros[1], reverse, frame_mask)
        return out
    if reverse:
        perm = [(i + 1, i) for i in range(n_shards - 1)]
    else:
        perm = [(i, i + 1) for i in range(n_shards - 1)]

    def body(_, carry):
        h, c = carry
        _, (hf, cf) = lstm_scan(xp, w_hh, h, c, reverse, frame_mask)
        hf = jax.lax.ppermute(hf, axis, perm)
        cf = jax.lax.ppermute(cf, axis, perm)
        return hf, cf

    h, c = jax.lax.fori_loop(0, n_shards - 1, body, zeros)
    out, _ = lstm_scan(xp, w_hh, h, c, reverse, frame_mask)
    return out


def make_sp_mask_fn(model: MaskNet, mesh: Mesh, axis: str = "seq"):
    """Jitted ``fn(variables, spec [B, T, F], emb [B, E]) -> mask [B, T, F]``
    with T sharded over ``mesh``'s `axis`.

    `spec` is the normalized magnitude spectrogram (the model's input
    domain).  T must be divisible by the axis size and each shard must
    cover the conv halo (``T / K ≥ conv_context_left``); `pad_frames`
    below handles both for callers.  `t_valid` (scalar int) marks frames
    ``[0, t_valid)`` as real; alignment padding beyond it is edge-masked
    at every conv layer and skipped by the recurrence, so the output on
    real frames is exactly the unpadded full-sequence pass."""
    n_shards = mesh.shape[axis]
    ctx_l, ctx_r = model.conv_context_left, model.conv_context_right

    def shard_fn(variables, spec, emb, t_valid):
        B, Tc, F = spec.shape
        shard = jax.lax.axis_index(axis)
        # --- conv halo exchange -----------------------------------------
        if n_shards > 1 and ctx_l > 0:
            right_perm = [(i, i + 1) for i in range(n_shards - 1)]
            from_left = jax.lax.ppermute(spec[:, -ctx_l:], axis, right_perm)
        else:
            from_left = jnp.zeros((B, ctx_l, F), spec.dtype)
        if n_shards > 1 and ctx_r > 0:
            left_perm = [(i + 1, i) for i in range(n_shards - 1)]
            from_right = jax.lax.ppermute(spec[:, :ctx_r], axis, left_perm)
        else:
            from_right = jnp.zeros((B, ctx_r, F), spec.dtype)
        window = jnp.concatenate([from_left, spec, from_right], axis=1)

        # global frame index of every window position → validity mask
        # (zero-masked frames behave exactly like the full pass's conv
        # zero padding at every layer — see MaskNet.conv_features)
        g = shard * Tc + jnp.arange(-ctx_l, Tc + ctx_r)
        win_valid = ((g >= 0) & (g < t_valid))[None, :]
        feats = model.apply(
            variables, window, edge_mask=win_valid, method=model.conv_features
        )
        feats = feats[:, ctx_l : ctx_l + Tc]  # [B, Tc, 8F]
        local_valid = win_valid[0, ctx_l : ctx_l + Tc]  # [Tc]

        # --- mask head: shard-local projections, relayed recurrence ------
        # (the same math as MaskNet.mask_head, reference
        # `models/voicefilter/model.py:77-88`, with the BiLSTM's two scans
        # replaced by relay scans; parity pinned by
        # tests/test_sequence_parallel.py)
        p = variables["params"]
        cd = jnp.dtype(model.compute_dtype)
        emb_t = jnp.broadcast_to(emb.astype(cd)[:, None, :], (B, Tc, model.emb_dim))
        x = jnp.concatenate([feats.astype(cd), emb_t], axis=-1)
        lp = p["lstm"]
        out = []
        for direction, rev in (("fwd", False), ("bwd", True)):
            xp = x @ lp[f"{direction}_w_ih"].astype(cd) + lp[f"{direction}_b"].astype(cd)
            out.append(
                _relay_scan(
                    xp, lp[f"{direction}_w_hh"].astype(cd), n_shards, axis, rev,
                    frame_mask=local_valid,
                )
            )
        x = jax.nn.relu(jnp.concatenate(out, axis=-1))
        x = jax.nn.relu(x @ p["fc1"]["kernel"].astype(cd) + p["fc1"]["bias"].astype(cd))
        logits = x @ p["fc2"]["kernel"].astype(cd) + p["fc2"]["bias"].astype(cd)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )
    return jax.jit(sharded)


def pad_frames(T: int, n_shards: int, min_shard: int) -> int:
    """Padded frame count: divisible by `n_shards`, each shard ≥ `min_shard`."""
    per = max((T + n_shards - 1) // n_shards, min_shard)
    return per * n_shards


def separate_long(
    config: Config,
    variables,
    mixed_wav: np.ndarray,  # [L] or [B, L]
    emb: np.ndarray,  # [E] or [B, E]
    mesh: Optional[Mesh] = None,
    synthesis_window: str = "hann",
) -> np.ndarray:
    """Separate an arbitrarily long mixture, time-sharded over the mesh.

    The single-clip path (`cli/separate.py`) runs the whole utterance on
    one device; this one spreads the mask network's activations over all
    of them.  STFT/iSTFT are basis matmuls with negligible state and run
    unsharded; zero-padded frames (shard alignment) are dropped before
    inversion and cannot leak into real frames — they are edge-masked at
    every conv layer and skipped by the recurrence (``t_valid``)."""
    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.models.masknet import make_masknet

    mesh = mesh if mesh is not None else make_seq_mesh()
    model = make_masknet(config)
    ap = AudioProcessor(config.audio, synthesis_window=synthesis_window)

    wav = np.atleast_2d(np.asarray(mixed_wav, np.float32))
    emb = np.atleast_2d(np.asarray(emb, np.float32))
    spec, phase = ap.wav2spec_batch(jnp.asarray(wav))
    spec, phase = np.asarray(spec), np.asarray(phase)
    B, T, F = spec.shape

    n_shards = mesh.shape["seq"]
    Tp = pad_frames(T, n_shards, model.conv_context_left)
    spec_p = np.zeros((B, Tp, F), np.float32)
    spec_p[:, :T] = spec

    fn = make_sp_mask_fn(model, mesh)
    sharding = NamedSharding(mesh, P(None, "seq", None))
    mask = fn(
        variables, jax.device_put(spec_p, sharding), jnp.asarray(emb),
        jnp.asarray(T, jnp.int32),
    )
    mask = np.asarray(mask)[:, :T]

    est = mask * spec
    out = np.asarray(
        ap.spec2wav_batch(jnp.asarray(est), jnp.asarray(phase), length=wav.shape[-1])
    )
    return out[0] if np.ndim(mixed_wav) == 1 else out
