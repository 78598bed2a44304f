"""Micro-bench: fused Pallas conv chain (`ops/conv_fused.py`) vs the
default folded path (XLA conv + `ops/bn_act.py`) at flagship shape.

Measures the 6-heavy-layer chain fwd and fwd+bwd with a dense external
cotangent (same methodology as ablate_conv.py).  Run alone on the chip:

    PYTHONPATH=. python scripts/ablate_fused_conv.py [fwd|bwd|all]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

B, T, F, C = 16, 301, 601, 64
C2 = 2 * C
SPECS = [((7, 1), 1), ((5, 5), 1), ((5, 5), 2), ((5, 5), 4), ((5, 5), 8), ((5, 5), 16)]
ACT = "mish"
EPS = 1e-5


def sync(x):
    float(jax.device_get(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32)))


def timed(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    from voicesplit_tpu.ops.bn_act import folded_bn_act_train
    from voicesplit_tpu.ops.conv_fold import conv2d_folded, folded_freq, zero_pad_column
    from voicesplit_tpu.ops.conv_fused import make_chain

    rng = np.random.default_rng(0)
    Fb = folded_freq(F)
    y1 = jnp.asarray(
        (rng.standard_normal((B, T, Fb, C2)) * 0.5).astype(np.float32), jnp.bfloat16
    )
    y1 = zero_pad_column(y1, F)
    R = zero_pad_column(
        jnp.asarray(rng.standard_normal((B, T, Fb, C2)).astype(np.float32), jnp.bfloat16), F
    )
    ws = tuple(
        jnp.asarray((rng.standard_normal((k[0], k[1], C, C)) * 0.05).astype(np.float32))
        for k, _ in SPECS
    )
    cbs = tuple(jnp.zeros((C,), jnp.float32) for _ in SPECS)
    scales = tuple(jnp.ones((C,), jnp.float32) for _ in SPECS[:-1])
    biases = tuple(jnp.zeros((C,), jnp.float32) for _ in SPECS[:-1])

    chain = make_chain(SPECS, T, F, ACT, EPS)

    def fused_fwd(y1, ws, cbs, scales, biases, R):
        raw, means, vars_ = chain(y1, ws, cbs, scales, biases)
        return jnp.sum(raw.astype(jnp.float32) * R)

    def default_fwd(y1, ws, cbs, scales, biases, R):
        h = y1
        for idx, ((kt, kf), dt) in enumerate(SPECS):
            raw = conv2d_folded(h, ws[idx].astype(jnp.bfloat16), cbs[idx].astype(jnp.bfloat16), (dt, 1))
            if idx + 1 == len(SPECS):
                return jnp.sum(zero_pad_column(raw, F).astype(jnp.float32) * R)
            h, _, _ = folded_bn_act_train(raw, scales[idx], biases[idx], F, ACT, EPS)

    args = (y1, ws, cbs, scales, biases, R)
    if mode in ("fwd", "all"):
        print("chain fwd (6 heavy layers, loss-reduced):")
        print(f"  default  {timed(jax.jit(default_fwd), *args):7.2f} ms")
        print(f"  fused    {timed(jax.jit(fused_fwd), *args):7.2f} ms")
        d = float(
            jnp.abs(jax.jit(fused_fwd)(*args) - jax.jit(default_fwd)(*args))
            / (1e-6 + jnp.abs(jax.jit(default_fwd)(*args)))
        )
        print(f"  rel|Δloss| = {d:.2e}")

    if mode in ("bwd", "all"):
        gd = jax.jit(jax.grad(default_fwd, argnums=(0, 1, 3, 4)))
        gf = jax.jit(jax.grad(fused_fwd, argnums=(0, 1, 3, 4)))
        print("chain fwd+bwd (grads wrt y1, W, bn scale/bias):")
        print(f"  default  {timed(gd, *args):7.2f} ms")
        print(f"  fused    {timed(gf, *args):7.2f} ms")
        a, b = gf(*args), gd(*args)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            ref = np.asarray(lb, np.float32)
            got = np.asarray(la, np.float32)
            den = max(1e-6, float(np.max(np.abs(ref))))
            rel = float(np.max(np.abs(got - ref))) / den
            if rel > 3e-2:
                print(f"  GRAD MISMATCH rel={rel:.3e} shape={ref.shape}")


if __name__ == "__main__":
    sys.exit(main())
