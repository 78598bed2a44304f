"""Scale-invariant SNR with permutation-invariant training (uPIT).

Reference `utils/generic_utils.py:403-474` (`SiSNR_With_Pit`, itself from
the Conv-TasNet PIT criterion).  Vectorized jnp: the pairwise projection
SI-SNR matrix is one batched einsum, and the permutation search is a
static ``[C!, C]`` gather + max (C is tiny — the trainer uses C=1, where
PIT degenerates to plain negative SI-SNR, reference `train.py:101-103` —
but C stays general here).
"""

from __future__ import annotations

from itertools import permutations

import jax.numpy as jnp
import numpy as np


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """``[B] → [B, 1, max_len]`` 0/1 mask (reference `get_mask`, `:403-415`)."""
    pos = jnp.arange(max_len)[None, None, :]
    return (pos < lengths[:, None, None]).astype(jnp.float32)


def si_snr_matrix(
    estimate: jnp.ndarray,  # [B, C, T]
    source: jnp.ndarray,  # [B, C, T]
    lengths: jnp.ndarray | None = None,  # [B]
    epsilon: float = 1e-16,
) -> jnp.ndarray:
    """Pairwise SI-SNR ``[B, C_est, C_src]`` after masking + zero-meaning."""
    B, C, T = source.shape
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    mask = sequence_mask(lengths, T)
    estimate = estimate * mask
    source = source * mask

    # max(len, 1): a zero-length item (fully masked) must yield a finite
    # 0-energy row, not NaN-poison the whole batch through 0/0.
    num = jnp.maximum(lengths[:, None, None].astype(jnp.float32), 1.0)
    source = (source - jnp.sum(source, 2, keepdims=True) / num) * mask
    estimate = (estimate - jnp.sum(estimate, 2, keepdims=True) / num) * mask

    s_tgt = source[:, None, :, :]  # [B, 1, C, T]
    s_est = estimate[:, :, None, :]  # [B, C, 1, T]
    dot = jnp.sum(s_est * s_tgt, axis=3, keepdims=True)  # [B, C, C, 1]
    tgt_energy = jnp.sum(s_tgt**2, axis=3, keepdims=True) + epsilon
    proj = dot * s_tgt / tgt_energy  # [B, C, C, T]
    noise = s_est - proj
    ratio = jnp.sum(proj**2, axis=3) / (jnp.sum(noise**2, axis=3) + epsilon)
    return 10.0 * jnp.log10(ratio + epsilon)  # [B, C, C]


def si_snr_with_pit(
    estimate: jnp.ndarray,
    source: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    epsilon: float = 1e-16,
) -> jnp.ndarray:
    """PIT loss: ``20 - mean(max-permutation SI-SNR / C)`` (reference `:461-474`)."""
    B, C, T = source.shape
    matrix = si_snr_matrix(estimate, source, lengths, epsilon)
    perms = np.array(list(permutations(range(C))), dtype=np.int32)  # [C!, C]
    # snr_set[b, p] = sum_i matrix[b, i, perms[p, i]]
    gathered = matrix[:, np.arange(C)[None, :], perms]  # [B, C!, C]
    snr_set = jnp.sum(gathered, axis=-1)
    max_snr = jnp.max(snr_set, axis=-1) / C  # [B]
    return 20.0 - jnp.mean(max_snr)


def si_snr(
    estimate: jnp.ndarray,  # [..., T]
    source: jnp.ndarray,  # [..., T]
    epsilon: float = 1e-16,
    lengths: jnp.ndarray | None = None,  # broadcastable to [..., 1] leading dims
) -> jnp.ndarray:
    """Plain SI-SNR in dB per item (eval metric; higher is better).

    ``lengths`` masks the trailing zero-pad of short items so their
    reconstruction noise over silence doesn't deflate the metric."""
    if lengths is not None:
        T = source.shape[-1]
        mask = (jnp.arange(T) < lengths[..., None]).astype(source.dtype)
        source = source * mask
        estimate = estimate * mask
        cnt = jnp.maximum(lengths[..., None].astype(source.dtype), 1.0)
        source = (source - jnp.sum(source, -1, keepdims=True) / cnt) * mask
        estimate = (estimate - jnp.sum(estimate, -1, keepdims=True) / cnt) * mask
    else:
        source = source - jnp.mean(source, axis=-1, keepdims=True)
        estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * source, axis=-1, keepdims=True)
    energy = jnp.sum(source**2, axis=-1, keepdims=True) + epsilon
    proj = dot * source / energy
    noise = estimate - proj
    ratio = jnp.sum(proj**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + epsilon)
    return 10.0 * jnp.log10(ratio + epsilon)
