"""LSTM layers as `lax.scan` with hoisted input projections.

The reference uses cuDNN's fused bidirectional LSTM
(`models/voicefilter/model.py:58-62`).  The TPU-native shape of the same
computation:

- The input projection ``x_t @ W_ih`` for ALL timesteps is ONE
  ``[B*T, in] @ [in, 4H]`` matmul outside the scan — for this model that
  is the ``5064 × 1600`` projection, the single biggest MXU op in the
  network (≈16.2 M of the ≈19 M params).
- The scan body then only does the small recurrent matmul
  ``h @ W_hh [H, 4H]`` plus elementwise gates, keeping the sequential
  part minimal.
- Bidirectional = the same scan run forward and reversed, concatenated —
  two independent scans XLA can overlap.

Gate layout is ``[i, f, g, o]``.  `UniLSTM` exposes its ``(h, c)`` carry
so streaming inference can thread state across chunks (BASELINE config 5).
Parameter names (``{fwd,bwd}_w_ih / _w_hh / _b``) are stable so sharding
rules in `voicesplit_tpu.parallel` can target the wide-variant split of
the gate dimension across the model mesh axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def lstm_scan(
    x_proj: jnp.ndarray,  # [B, T, 4H] — precomputed x @ w_ih + b
    w_hh: jnp.ndarray,  # [H, 4H]
    h0: jnp.ndarray,  # [B, H]
    c0: jnp.ndarray,  # [B, H]
    reverse: bool = False,
    frame_mask: Optional[jnp.ndarray] = None,  # [T] or [B, T] 0/1
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Recurrent scan; returns ``([B, T, H], final (h, c))``.

    Frames where `frame_mask` is 0 leave the carry untouched (the state
    skips over them) — used by the sequence-parallel engine so alignment
    padding cannot perturb the recurrence that real frames see."""

    def step(carry, xs_t):
        h, c = carry
        if frame_mask is None:
            xp_t = xs_t
        else:
            xp_t, m_t = xs_t  # m_t: [B, 1]
        gates = xp_t + h @ w_hh  # [B, 4H]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        if frame_mask is not None:
            c_new = jnp.where(m_t, c_new, c)
            h_new = jnp.where(m_t, h_new, h)
        return (h_new, c_new), h_new

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H] — scan over time
    if frame_mask is not None:
        m = jnp.broadcast_to(
            jnp.atleast_2d(frame_mask), (x_proj.shape[0], x_proj.shape[1])
        ).astype(bool)
        xs = (xs, jnp.swapaxes(m, 0, 1)[..., None])  # [T, B, 1]
    (h_f, c_f), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), (h_f, c_f)


class _LSTMBase(nn.Module):
    hidden: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True  # fused kernel on TPU; lax.scan elsewhere

    def _direction_params(self, name: str, features: int):
        H = self.hidden
        scale = 1.0 / (H**0.5)

        def uniform_init(key, shape, dtype):
            # Uniform(-1/sqrt(H), 1/sqrt(H)) — the standard LSTM init.
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        w_ih = self.param(f"{name}_w_ih", uniform_init, (features, 4 * H), self.param_dtype)
        w_hh = self.param(f"{name}_w_hh", uniform_init, (H, 4 * H), self.param_dtype)
        b = self.param(f"{name}_b", uniform_init, (4 * H,), self.param_dtype)
        return w_ih, w_hh, b

    def _run(self, x, w_ih, w_hh, b, h0, c0, reverse):
        cd = self.compute_dtype
        x_proj = x.astype(cd) @ w_ih.astype(cd) + b.astype(cd)
        if self.use_pallas:
            from voicesplit_tpu.ops.lstm_pallas import (
                fused_lstm_scan,
                pallas_lstm_available,
            )

            if pallas_lstm_available():
                if reverse:
                    out, carry = fused_lstm_scan(
                        x_proj[:, ::-1], w_hh.astype(cd), h0.astype(cd), c0.astype(cd)
                    )
                    return out[:, ::-1], carry
                return fused_lstm_scan(
                    x_proj, w_hh.astype(cd), h0.astype(cd), c0.astype(cd)
                )
        return lstm_scan(x_proj, w_hh.astype(cd), h0.astype(cd), c0.astype(cd), reverse)


class UniLSTM(_LSTMBase):
    """Unidirectional LSTM; returns ``(outputs [B, T, H], (h, c))``."""

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        carry: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        B, T, F = x.shape
        w_ih, w_hh, b = self._direction_params("fwd", F)
        if carry is None:
            h0 = jnp.zeros((B, self.hidden), self.compute_dtype)
            c0 = jnp.zeros((B, self.hidden), self.compute_dtype)
        else:
            h0, c0 = (carry[0].astype(self.compute_dtype), carry[1].astype(self.compute_dtype))
        return self._run(x, w_ih, w_hh, b, h0, c0, reverse=False)


class BiLSTM(_LSTMBase):
    """Bidirectional LSTM; returns ``[B, T, 2H]`` (fwd ∥ bwd concat).

    On TPU both directions run in ONE fused sequential Pallas kernel
    (direction stacked into the batch dim — halves the sequential kernel
    count and doubles MXU row occupancy per step)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, F = x.shape
        cd = self.compute_dtype
        zeros = jnp.zeros((B, self.hidden), cd)
        wf = self._direction_params("fwd", F)
        wb = self._direction_params("bwd", F)
        if self.use_pallas and B % 8 == 0:
            from voicesplit_tpu.ops.lstm_pallas import (
                fused_bilstm_scan,
                pallas_lstm_available,
            )

            if pallas_lstm_available():
                xc = x.astype(cd)
                xp_f = xc @ wf[0].astype(cd) + wf[2].astype(cd)
                xp_b = xc @ wb[0].astype(cd) + wb[2].astype(cd)
                out_f, out_b = fused_bilstm_scan(
                    xp_f, xp_b, wf[1].astype(cd), wb[1].astype(cd)
                )
                return jnp.concatenate([out_f, out_b], axis=-1)
        out_f, _ = self._run(x, *wf, zeros, zeros, reverse=False)
        out_b, _ = self._run(x, *wb, zeros, zeros, reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1)


# Public aliases
LSTM = UniLSTM
LSTMCellParams = None  # reserved: fused Pallas cell lands in ops/
