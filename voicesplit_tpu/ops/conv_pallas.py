"""Time-dilated 2-D convolution as Pallas TPU kernels.

The mask net's dominant cost is the 5×5 time-dilated conv stack over
``[B, T, F=601, C=64]`` (reference `models/voicefilter/model.py:17-54`).
On v5e XLA runs each heavy layer at ~24% of bf16 peak (measured: 12.4 ms
fwd, 31 ms fwd+bwd per layer at B=16) because the contraction per
position is only K=C=64 — half the MXU's lanes/sublanes.

These kernels restructure the conv so the MXU runs dense 320×320
contractions:

- **K-fold (time)**: the ``kt`` time taps are folded into the
  contraction dim inside VMEM — ``xt[t, f, i*C+c] = x[t + i*dt, f, c]``
  built with ``kt`` cheap VMEM copies, giving K = kt*C = 320.
- **N-fold (freq)**: all ``kf`` frequency taps' partial outputs are
  produced by ONE matmul against ``W [kt*C, kf*C_out]`` (N = 320), then
  combined by an in-kernel shift-add over the frequency axis (sublane
  slices — free on the VPU).
- The input window is DMA'd HBM→VMEM once per tile with tile-aligned
  offsets only: time is a major dim (any offset legal), the freq window
  starts at the 128-aligned tile base, channels are whole.
- **Data grad** is the SAME kernel with tap-flipped, channel-transposed
  packed weights (stride-1 SAME-conv identity).
- **Filter grad** contracts the folded operand against a freq-fold of
  ``dy``: ``dW[(i,c),(j,co)] = xtᵀ @ dycat`` — M=N=320, K=rows — and
  accumulates in a VMEM-resident fp32 block across the whole grid.

Layouts: NHWC (time=H).  Supports ``df == 1`` and odd ``kt``/``kf``
(everything the model uses); `conv_dispatch` falls back to XLA conv for
the tiny input/projection layers where the folding can't pay off.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FREQ_HALO = 8  # left-pad of the freq axis; window width = f_tile + 2*halo


def _tiles(dt: int, itemsize: int = 2) -> Tuple[int, int]:
    """(t_tile, f_tile).  v5e has 128 MB VMEM — big tiles keep the grid
    short (sequential grid steps have fixed overhead) and the MXU fed.
    Sized for bf16; 4-byte dtypes halve the time tile so the scratch
    windows stay inside the scoped-vmem limit (fp32 at the bf16 tiles
    measured 107 MB > the 100 MB cap).  Override for sweeps:
    VOICESPLIT_CONV_TILES="t,f"."""
    import os

    v = os.environ.get("VOICESPLIT_CONV_TILES")
    if v:
        t, f = (int(s) for s in v.split(","))
        return t, f
    t = 32 if dt <= 16 else 16
    if itemsize > 2:
        t = max(8, t // 2)
    return t, 640


def pallas_conv_available() -> bool:
    """Opt-in (VOICESPLIT_PALLAS_CONV=1) and TPU-only.

    Measured v5e, B=16, [16,301,601,64]⊛[5,5,64,64]: this kernel runs
    15.5 ms fwd / 40 ms fwd+bwd per layer vs XLA's 12.5 / 32 — XLA's conv
    emitters win because the K/N-fold's VMEM copies and shift-add cost
    more VPU time than the MXU saves.  Kept as a correct, tested,
    self-contained conv implementation (custom VJP, no XLA conv anywhere)
    — the building block for fused inference kernels where the folds
    amortize across layers."""
    import os

    if os.environ.get("VOICESPLIT_PALLAS_CONV", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Forward / data-grad kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    x_hbm, w_ref, out_ref, xwin, xt, sem,
    *, kt, kf, dt, cin, cout, t_tile, fwin, grid_nt, grid_nf,
):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    fi = pl.program_id(2)
    twin = t_tile + (kt - 1) * dt
    f_tile = out_ref.shape[2]
    n_steps = pl.num_programs(0) * grid_nt * grid_nf
    step = (b * grid_nt + ti) * grid_nf + fi

    def start_dma(lin, slot):
        # lin → (b', ti', fi') for the double-buffered prefetch
        b2 = lin // (grid_nt * grid_nf)
        r = lin % (grid_nt * grid_nf)
        t2 = r // grid_nf
        f2 = r % grid_nf
        pltpu.make_async_copy(
            x_hbm.at[b2, pl.ds(t2 * t_tile, twin), pl.ds(f2 * f_tile, fwin), :],
            xwin.at[slot],
            sem.at[slot],
        ).start()

    slot = step % 2

    @pl.when(step == 0)
    def _():
        start_dma(0, 0)

    @pl.when(step + 1 < n_steps)
    def _():
        start_dma(step + 1, (step + 1) % 2)

    pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ti * t_tile, twin), pl.ds(fi * f_tile, fwin), :],
        xwin.at[slot],
        sem.at[slot],
    ).wait()

    # K-fold: xt[t, f, i*C + c] = xwin[t + i*dt, f, c].  xwin's lane dim
    # is 128-padded (HBM DMA alignment); the fold drops the pad lanes so
    # K stays kt*C.
    for i in range(kt):
        xt[:, :, i * cin : (i + 1) * cin] = xwin[
            slot, i * dt : i * dt + t_tile, :, 0:cin
        ]

    # One K=320, N=320 fp32-accumulated MXU matmul for all freq taps...
    z = (
        jnp.dot(
            xt[:].reshape(t_tile * fwin, kt * cin),
            w_ref[:],
            preferred_element_type=jnp.float32,
        )
        .astype(out_ref.dtype)
        .reshape(t_tile, fwin, kf * cout)
    )
    # ...then the N-fold shift-add: out[t,f,c] = sum_j z[t, f+j+off, j*cout+c]
    off = _FREQ_HALO - (kf - 1) // 2 if kf > 1 else 0
    acc = z[:, off : off + f_tile, 0:cout]
    for j in range(1, kf):
        acc += z[:, off + j : off + j + f_tile, j * cout : (j + 1) * cout]
    out_ref[0] = acc


def _pack_weights_fwd(w: jnp.ndarray) -> jnp.ndarray:
    """[kt, kf, Cin, Cout] → [kt*Cin, kf*Cout] (K=(i,c), N=(j,co))."""
    kt, kf, cin, cout = w.shape
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(kt * cin, kf * cout)


def _conv_fwd_core(x: jnp.ndarray, w: jnp.ndarray, dilation: Tuple[int, int]):
    """SAME-padded dilated conv. x [B,T,F,Cin] → [B,T,F,Cout]."""
    kt, kf, cin, cout = w.shape
    dt, df = dilation
    assert df == 1, "freq dilation unsupported (unused by the model)"
    assert kt % 2 == 1 and kf % 2 == 1
    B, T, F, _ = x.shape
    t_tile, f_tile = _tiles(dt, x.dtype.itemsize)
    pad_t = (kt - 1) * dt // 2  # SAME halo, symmetric (odd kt)
    halo_f = _FREQ_HALO if kf > 1 else 0

    Tp = _ceil_to(T, t_tile)
    Fp = _ceil_to(F, f_tile)
    cpad = _ceil_to(cin, 128)  # DMA slices need a 128-aligned lane dim
    fwin = f_tile + 2 * halo_f if kf > 1 else f_tile
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pad_t, pad_t + (Tp - T)),
            (halo_f, (Fp - F) + halo_f),
            (0, cpad - cin),
        ),
    )
    wt = _pack_weights_fwd(w).astype(x.dtype)

    twin = t_tile + (kt - 1) * dt
    grid = (B, Tp // t_tile, Fp // f_tile)
    kern = functools.partial(
        _fwd_kernel,
        kt=kt, kf=kf, dt=dt, cin=cin, cout=cout, t_tile=t_tile, fwin=fwin,
        grid_nt=grid[1], grid_nf=grid[2],
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(
                (kt * cin, kf * cout), lambda b, t, f: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, f_tile, cout),
            lambda b, t, f: (b, t, f, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Fp, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, twin, fwin, cpad), x.dtype),  # double-buffered
            pltpu.VMEM((t_tile, fwin, kt * cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, wt)
    return out[:, :T, :F, :]


# ---------------------------------------------------------------------------
# Filter-gradient kernel
# ---------------------------------------------------------------------------


def _wgrad_kernel(
    x_hbm, dy_hbm, dw_ref, xwin, xt, dywin, dycat, sem_x, sem_dy,
    *, kt, kf, dt, cin, cout, t_tile, fwin,
):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    fi = pl.program_id(2)
    twin = t_tile + (kt - 1) * dt
    f_tile = dycat.shape[1]

    cpx = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ti * t_tile, twin), pl.ds(fi * f_tile, fwin), :],
        xwin,
        sem_x,
    )
    cpd = pltpu.make_async_copy(
        dy_hbm.at[b, pl.ds(ti * t_tile, t_tile), pl.ds(fi * f_tile, fwin), :],
        dywin,
        sem_dy,
    )
    cpx.start()
    cpd.start()

    first = jnp.logical_and(jnp.logical_and(b == 0, ti == 0), fi == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    cpx.wait()
    for i in range(kt):
        xt[:, :, i * cin : (i + 1) * cin] = xwin[
            i * dt : i * dt + t_tile, :, 0:cin
        ]

    cpd.wait()
    # dycat[t, f', j*co + c] = dy[t_out = t, f_out = f' - (j - (kf-1)/2)]
    # with both arrays sharing the same halo_f left-pad convention.
    half = (kf - 1) // 2
    for j in range(kf):
        # window-relative dy index: f' + halo - (j - half)
        src = _FREQ_HALO - j + half if kf > 1 else 0
        dycat[:, :, j * cout : (j + 1) * cout] = dywin[
            :, src : src + f_tile, 0:cout
        ]

    # x center: window-relative f' + halo
    halo = _FREQ_HALO if kf > 1 else 0
    rows = t_tile * f_tile
    a = xt[:, halo : halo + f_tile, :].reshape(rows, kt * cin)
    dy_f = dycat[:].reshape(rows, kf * cout)
    dw_ref[:] += jax.lax.dot_general(
        a.astype(jnp.float32), dy_f.astype(jnp.float32),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conv_wgrad_core(
    x: jnp.ndarray, dy: jnp.ndarray, kernel: Tuple[int, int], dilation: Tuple[int, int]
) -> jnp.ndarray:
    """dL/dW [kt, kf, Cin, Cout] of the SAME dilated conv."""
    kt, kf = kernel
    dt, df = dilation
    assert df == 1
    B, T, F, cin = x.shape
    cout = dy.shape[-1]
    t_tile, f_tile = _tiles(dt, x.dtype.itemsize)
    pad_t = (kt - 1) * dt // 2
    halo_f = _FREQ_HALO if kf > 1 else 0

    Tp = _ceil_to(T, t_tile)
    Fp = _ceil_to(F, f_tile)
    cpad = _ceil_to(cin, 128)
    copad = _ceil_to(cout, 128)
    fwin = f_tile + 2 * halo_f if kf > 1 else f_tile
    xp = jnp.pad(
        x,
        ((0, 0), (pad_t, pad_t + (Tp - T)), (halo_f, (Fp - F) + halo_f), (0, cpad - cin)),
    )
    # dy zero-padded with the same freq convention + a freq halo so the
    # shifted reads stay in range; zero padding kills spurious terms.
    dyp = jnp.pad(
        dy,
        ((0, 0), (0, Tp - T), (halo_f, (Fp - F) + halo_f), (0, copad - cout)),
    )

    twin = t_tile + (kt - 1) * dt
    grid = (B, Tp // t_tile, Fp // f_tile)
    kern = functools.partial(
        _wgrad_kernel,
        kt=kt, kf=kf, dt=dt, cin=cin, cout=cout, t_tile=t_tile, fwin=fwin,
    )
    dw = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (kt * cin, kf * cout), lambda b, t, f: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kt * cin, kf * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((twin, fwin, cpad), x.dtype),
            pltpu.VMEM((t_tile, fwin, kt * cin), x.dtype),
            pltpu.VMEM((t_tile, fwin, copad), dy.dtype),
            pltpu.VMEM((t_tile, f_tile, kf * cout), dy.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, dyp)
    # [(i,c), (j,co)] → [kt, kf, Cin, Cout]
    return jnp.transpose(dw.reshape(kt, cin, kf, cout), (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# custom_vjp wrapper + dispatch
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_pallas(x: jnp.ndarray, w: jnp.ndarray, dilation: Tuple[int, int]):
    """SAME time-dilated conv ``[B,T,F,Cin] ⊛ [kt,kf,Cin,Cout]`` (no bias)."""
    return _conv_fwd_core(x, w, dilation)


def _vjp_fwd(x, w, dilation):
    return _conv_fwd_core(x, w, dilation), (x, w)


def _vjp_bwd(dilation, residuals, dy):
    x, w = residuals
    kt, kf = w.shape[0], w.shape[1]
    # data grad: SAME conv of dy with tap-flipped, channel-transposed weights
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv_fwd_core(dy.astype(x.dtype), w_flip.astype(x.dtype), dilation)
    dw = _conv_wgrad_core(x, dy, (kt, kf), dilation).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv2d_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def conv_dispatch(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    dilation: Tuple[int, int],
) -> jnp.ndarray:
    """Pallas kernels for the heavy layers; XLA conv for the rest.

    The folding needs Cin/Cout ≥ a full 64-lane group to pay off; the
    (1,7)-on-1-channel input layer and the 1×1 projection (<2% of conv
    FLOPs) run through XLA."""
    kt, kf, cin, cout = w.shape
    use_pallas = (
        pallas_conv_available()
        and dilation[1] == 1
        and cin >= 64
        and cout >= 64
        and (kt > 1 or kf > 1)
        and kt % 2 == 1
        and kf % 2 == 1
    )
    if use_pallas:
        out = conv2d_pallas(x, w.astype(x.dtype), dilation)
    else:
        pad_t = (kt - 1) * dilation[0] // 2
        pad_f = (kf - 1) * dilation[1] // 2
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            (1, 1),
            ((pad_t, pad_t), (pad_f, pad_f)),
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
