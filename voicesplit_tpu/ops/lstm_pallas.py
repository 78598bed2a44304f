"""Fused LSTM recurrence as a Pallas TPU kernel.

The model's BiLSTM is a `lax.scan` whose per-step work is one small
matmul ``h @ W_hh [H, 4H]`` plus elementwise gates
(`voicesplit_tpu/models/lstm.py`).  Under XLA each scan iteration
re-streams ``W_hh`` and the gate temporaries through HBM; this kernel
instead runs the WHOLE time loop inside one Pallas program:

- grid ``(T,)`` — sequential on a TensorCore, so VMEM scratch carries
  ``(h, c)`` across steps;
- ``W_hh`` (1.28 MB bf16 at H=400) stays resident in VMEM for all T
  steps — zero re-fetch;
- the gate nonlinearities fuse into the matmul epilogue on the VPU;
- backward is a second kernel walking the grid in reverse, carrying
  ``(dh, dc)`` in scratch and accumulating ``dW_hh`` in a VMEM
  accumulator that is written out once.

Precision: the recurrent MXU matmuls run in the dtype the caller hands
``w_hh`` / ``x_proj`` in (bf16 under the model's default compute_dtype —
an fp32 matmul costs ~6 MXU passes per bf16 pass on v5e, and was the
dominant per-step latency).  The carried ``(h, c)`` state, the gate
activations, and every backward accumulator (``dh``, ``dc``, ``dW_hh``)
stay fp32 regardless — only the matmul OPERANDS are cast, mirroring
standard mixed-precision LSTM training.

Forward saves the activated gates ``[T, B, 4H]`` and cell states for the
backward pass (the standard memory/recompute trade — the gates are small
next to the conv activations).

Layouts are time-major ``[T, B, ·]`` so each grid step's block is a
contiguous ``[1, B, ·]`` slice.  `fused_lstm_scan` wraps the kernels in a
`jax.custom_vjp` with the same signature/results as
`models.lstm.lstm_scan` (batch-major in/out) and is numerically
interchangeable with it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mxu_precision(dtype) -> jax.lax.Precision | None:
    """fp32 operands must request HIGHEST or Mosaic runs the MXU in
    single-pass bf16 (measured on v5e: dgrad err vs float64 3.3e-3 at
    H=400 — docs/KERNELS.md "LSTM backward precision").  bf16 operands
    are native MXU inputs; leave them at default (single pass, exact)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def pallas_lstm_available() -> bool:
    """Fused kernel on TPU by default (validated on v5e: forward exact vs
    lax.scan, fwd+bwd 1.6x faster); VOICESPLIT_PALLAS_LSTM=0 opts out."""
    import os

    if os.environ.get("VOICESPLIT_PALLAS_LSTM", "1") != "1":
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xp_ref, whh_ref, h0_ref, c0_ref, hs_ref, cs_ref, gates_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    H = h_scr.shape[-1]
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_scr[:].astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(whh_ref.dtype),
    )
    i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
    c = f * c_scr[:] + i * g
    h = o * jnp.tanh(c)
    h_scr[:] = h
    c_scr[:] = c
    hs_ref[0] = h
    cs_ref[0] = c
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)


def _fwd(xp, whh, h0, c0):
    """xp [T, B, 4H] → (hs, cs, gates) time-major."""
    T, B, G = xp.shape
    H = G // 4
    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # hs
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # cs
        jax.ShapeDtypeStruct((T, B, G), jnp.float32),  # activated gates
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=not pallas_lstm_available(),
    )(xp, whh, h0.astype(jnp.float32), c0.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Backward kernel (reverse grid walk)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    whh_ref, gates_ref, cs_prev_ref, hs_prev_ref, dhs_ref, dhf_ref, dcf_ref,
    dxp_ref, dwhh_ref, dh0_ref, dc0_ref,
    dh_scr, dc_scr, dw_scr,
):
    t = pl.program_id(0)  # walks T-1 → 0 via index maps
    n = pl.num_programs(0)
    H = dh_scr.shape[-1]

    @pl.when(t == 0)
    def _():
        # reverse carry starts from the final-state cotangents
        dh_scr[:] = dhf_ref[:]
        dc_scr[:] = dcf_ref[:]
        dw_scr[:] = jnp.zeros_like(dw_scr)

    gates = gates_ref[0]
    i = gates[:, 0 * H : 1 * H]
    f = gates[:, 1 * H : 2 * H]
    g = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H : 4 * H]
    c_prev = cs_prev_ref[0]
    h_prev = hs_prev_ref[0]
    c = f * c_prev + i * g
    tc = jnp.tanh(c)

    dh = dhs_ref[0] + dh_scr[:]
    do = dh * tc
    dct = dh * o * (1.0 - tc * tc) + dc_scr[:]
    di = dct * g
    dg = dct * i
    df = dct * c_prev
    dc_prev = dct * f

    dgi = di * i * (1.0 - i)
    dgf = df * f * (1.0 - f)
    dgg = dg * (1.0 - g * g)
    dgo = do * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)  # [B, 4H]

    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dgates_mxu = dgates.astype(whh_ref.dtype)
    prec = _mxu_precision(whh_ref.dtype)
    # dh_prev = dgates @ whh^T
    dh_scr[:] = jax.lax.dot_general(
        dgates_mxu, whh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dc_scr[:] = dc_prev
    # dW_hh += h_prev^T @ dgates
    dw_scr[:] += jax.lax.dot_general(
        h_prev.astype(whh_ref.dtype), dgates_mxu, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(t == n - 1)  # after processing t_abs = 0
    def _():
        dwhh_ref[:] = dw_scr[:]
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _bwd(whh, gates, cs_prev, hs_prev, dhs, dhf, dcf, dxp_dtype=jnp.float32):
    T, B, G = gates.shape
    H = G // 4
    rev = lambda t: (T - 1 - t, 0, 0)
    in_specs = [
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
            pl.BlockSpec((1, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, B, G), dxp_dtype),  # dxp
        jax.ShapeDtypeStruct((H, G), jnp.float32),  # dwhh
        jax.ShapeDtypeStruct((B, H), jnp.float32),  # dh0
        jax.ShapeDtypeStruct((B, H), jnp.float32),  # dc0
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, G), jnp.float32),
        ],
        interpret=not pallas_lstm_available(),
    )(whh, gates, cs_prev, hs_prev, dhs, dhf, dcf)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (batch-major public API, matching models.lstm.lstm_scan)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Fused bidirectional kernels: both directions advance in ONE sequential
# pass — step t processes fwd-time t in rows [0, B) and bwd-time T-1-t in
# rows [B, 2B).  Halves the number of sequential Pallas programs and
# keeps both W_hh resident; the two recurrent matmuls per step pipeline
# on the MXU within one kernel instead of across two kernel launches.
# ---------------------------------------------------------------------------


def _fwd2_kernel(
    xp_ref, whhf_ref, whhb_ref, h0_ref, c0_ref, hs_ref, cs_ref, gates_ref,
    h_scr, c_scr, *, half,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    H = h_scr.shape[-1]
    B = half
    h_mxu = h_scr[:].astype(whhf_ref.dtype)
    prec = _mxu_precision(whhf_ref.dtype)
    rec_f = jnp.dot(h_mxu[0:B], whhf_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    rec_b = jnp.dot(h_mxu[B:], whhb_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    gates = xp_ref[0].astype(jnp.float32) + jnp.concatenate([rec_f, rec_b], axis=0)
    i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
    c = f * c_scr[:] + i * g
    h = o * jnp.tanh(c)
    h_scr[:] = h
    c_scr[:] = c
    hs_ref[0] = h
    cs_ref[0] = c
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)


def _fwd2(xp, whh_f, whh_b, h0, c0):
    """xp [T, 2B, 4H] → (hs, cs, gates) time-major, both directions."""
    T, B2, G = xp.shape
    H = G // 4
    out_shape = (
        jax.ShapeDtypeStruct((T, B2, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B2, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B2, G), jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_fwd2_kernel, half=B2 // 2),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B2, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B2, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B2, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B2, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B2, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B2, G), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B2, H), jnp.float32),
            pltpu.VMEM((B2, H), jnp.float32),
        ],
        interpret=not pallas_lstm_available(),
    )(xp, whh_f, whh_b, h0.astype(jnp.float32), c0.astype(jnp.float32))


def _bwd2_kernel(
    whhf_ref, whhb_ref, gates_ref, cs_prev_ref, hs_prev_ref, dhs_ref,
    dxp_ref, dwf_ref, dwb_ref,
    dh_scr, dc_scr, dwf_scr, dwb_scr, *, half,
):
    t = pl.program_id(0)  # walks T-1 → 0 via index maps
    n = pl.num_programs(0)
    H = dh_scr.shape[-1]
    B = half

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwf_scr[:] = jnp.zeros_like(dwf_scr)
        dwb_scr[:] = jnp.zeros_like(dwb_scr)

    gates = gates_ref[0]
    i = gates[:, 0 * H : 1 * H]
    f = gates[:, 1 * H : 2 * H]
    g = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H : 4 * H]
    c_prev = cs_prev_ref[0]
    h_prev = hs_prev_ref[0]
    c = f * c_prev + i * g
    tc = jnp.tanh(c)

    dh = dhs_ref[0] + dh_scr[:]
    do = dh * tc
    dct = dh * o * (1.0 - tc * tc) + dc_scr[:]
    di = dct * g
    dg = dct * i
    df = dct * c_prev
    dc_prev = dct * f

    dgi = di * i * (1.0 - i)
    dgf = df * f * (1.0 - f)
    dgg = dg * (1.0 - g * g)
    dgo = do * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)  # [2B, 4H]

    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dgates_mxu = dgates.astype(whhf_ref.dtype)
    h_prev_mxu = h_prev.astype(whhf_ref.dtype)
    prec = _mxu_precision(whhf_ref.dtype)
    dh_f = jax.lax.dot_general(
        dgates_mxu[0:B], whhf_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dh_b = jax.lax.dot_general(
        dgates_mxu[B:], whhb_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dh_scr[:] = jnp.concatenate([dh_f, dh_b], axis=0)
    dc_scr[:] = dc_prev
    dwf_scr[:] += jax.lax.dot_general(
        h_prev_mxu[0:B], dgates_mxu[0:B], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dwb_scr[:] += jax.lax.dot_general(
        h_prev_mxu[B:], dgates_mxu[B:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(t == n - 1)
    def _():
        dwf_ref[:] = dwf_scr[:]
        dwb_ref[:] = dwb_scr[:]


def _bwd2(whh_f, whh_b, gates, cs_prev, hs_prev, dhs, dxp_dtype=jnp.float32):
    T, B2, G = gates.shape
    H = G // 4
    rev = lambda t: (T - 1 - t, 0, 0)
    return pl.pallas_call(
        functools.partial(_bwd2_kernel, half=B2 // 2),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B2, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B2, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B2, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B2, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B2, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B2, G), dxp_dtype),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B2, H), jnp.float32),
            pltpu.VMEM((B2, H), jnp.float32),
            pltpu.VMEM((H, G), jnp.float32),
            pltpu.VMEM((H, G), jnp.float32),
        ],
        interpret=not pallas_lstm_available(),
    )(whh_f, whh_b, gates, cs_prev, hs_prev, dhs)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_bilstm_scan(
    x_proj_f: jnp.ndarray,  # [B, T, 4H] — fwd-direction input projection
    x_proj_b: jnp.ndarray,  # [B, T, 4H] — bwd-direction input projection
    w_hh_f: jnp.ndarray,  # [H, 4H]
    w_hh_b: jnp.ndarray,  # [H, 4H]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both BiLSTM directions in one fused sequential kernel.

    Zero initial state (what the model's BiLSTM uses).  Returns
    ``(out_f [B, T, H], out_b [B, T, H])`` — bwd outputs already
    back-reversed into natural time order.
    """
    out, _ = _fused2_fwd(x_proj_f, x_proj_b, w_hh_f, w_hh_b)
    return out


def _fused2_fwd(x_proj_f, x_proj_b, w_hh_f, w_hh_b):
    B, T, G = x_proj_f.shape
    H = G // 4
    xcat = jnp.concatenate(
        [jnp.swapaxes(x_proj_f, 0, 1), jnp.swapaxes(x_proj_b[:, ::-1], 0, 1)],
        axis=1,
    )  # [T, 2B, G]
    zeros = jnp.zeros((2 * B, H), jnp.float32)
    hs, cs, gates = _fwd2(xcat, w_hh_f, w_hh_b, zeros, zeros)
    out_f = jnp.swapaxes(hs[:, :B], 0, 1).astype(x_proj_f.dtype)
    out_b = jnp.swapaxes(hs[:, B:], 0, 1)[:, ::-1].astype(x_proj_f.dtype)
    # dtype carrier: residuals must be JAX types, so a 0-size array stands
    # in for the primal x dtype the cotangent must come back in
    residuals = (w_hh_f, w_hh_b, gates, cs, hs, jnp.zeros((0,), x_proj_f.dtype))
    return (out_f, out_b), residuals


def _fused2_bwd(residuals, grads):
    w_hh_f, w_hh_b, gates, cs, hs, x_dtype_carrier = residuals
    x_dtype = x_dtype_carrier.dtype
    d_out_f, d_out_b = grads
    T, B2, H = hs.shape
    B = B2 // 2
    dhs = jnp.concatenate(
        [
            jnp.swapaxes(d_out_f.astype(jnp.float32), 0, 1),
            jnp.swapaxes(d_out_b.astype(jnp.float32)[:, ::-1], 0, 1),
        ],
        axis=1,
    )  # [T, 2B, H]
    zeros = jnp.zeros((B2, H), jnp.float32)
    cs_prev = jnp.concatenate([zeros[None], cs[:-1]], axis=0)
    hs_prev = jnp.concatenate([zeros[None], hs[:-1]], axis=0)
    dxp, dwf, dwb = _bwd2(
        w_hh_f, w_hh_b, gates, cs_prev, hs_prev, dhs, dxp_dtype=x_dtype
    )
    dxp_f = jnp.swapaxes(dxp[:, :B], 0, 1)
    dxp_b = jnp.swapaxes(dxp[:, B:], 0, 1)[:, ::-1]
    return dxp_f, dxp_b, dwf.astype(w_hh_f.dtype), dwb.astype(w_hh_b.dtype)


fused_bilstm_scan.defvjp(_fused2_fwd, _fused2_bwd)


@jax.custom_vjp
def fused_lstm_scan(
    x_proj: jnp.ndarray,  # [B, T, 4H]
    w_hh: jnp.ndarray,  # [H, 4H]
    h0: jnp.ndarray,  # [B, H]
    c0: jnp.ndarray,  # [B, H]
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    out, _ = _fused_fwd(x_proj, w_hh, h0, c0)
    return out


def _fused_fwd(x_proj, w_hh, h0, c0):
    xp = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    hs, cs, gates = _fwd(xp, w_hh, h0, c0)
    outputs = jnp.swapaxes(hs, 0, 1).astype(x_proj.dtype)
    h_final = hs[-1]
    c_final = cs[-1]
    result = (outputs, (h_final.astype(x_proj.dtype), c_final.astype(x_proj.dtype)))
    residuals = (w_hh, gates, cs, hs, h0, c0, jnp.zeros((0,), x_proj.dtype))
    return result, residuals


def _fused_bwd(residuals, grads):
    w_hh, gates, cs, hs, h0, c0, x_dtype_carrier = residuals
    x_dtype = x_dtype_carrier.dtype
    d_outputs, (d_hfinal, d_cfinal) = grads
    dhs = jnp.swapaxes(d_outputs.astype(jnp.float32), 0, 1)  # [T, B, H]
    # cs/hs shifted: step t needs c_{t-1}, h_{t-1}
    cs_prev = jnp.concatenate([c0.astype(jnp.float32)[None], cs[:-1]], axis=0)
    hs_prev = jnp.concatenate([h0.astype(jnp.float32)[None], hs[:-1]], axis=0)
    dxp, dwhh, dh0, dc0 = _bwd(
        w_hh, gates, cs_prev, hs_prev, dhs,
        d_hfinal.astype(jnp.float32), d_cfinal.astype(jnp.float32),
        dxp_dtype=x_dtype,
    )
    dx_proj = jnp.swapaxes(dxp, 0, 1)
    return dx_proj, dwhh.astype(w_hh.dtype), dh0.astype(h0.dtype), dc0.astype(c0.dtype)


fused_lstm_scan.defvjp(_fused_fwd, _fused_bwd)
