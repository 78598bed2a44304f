"""Conv-stack internals ablation (companion to ablate_step.py).

Measures the conv stack fwd and fwd+bwd inside a realistic graph with a
DENSE external cotangent (a mean-loss cotangent lets XLA elide work and
flattered earlier numbers — docs/KERNELS.md's 63 ms was measured that
way; the in-step truth is ~114 ms).

Variants isolate: BatchNorm, activation, the frequency fold, and the
raw conv emitters.  Run alone on the chip.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, F, C = 16, 301, 601, 64
SPECS = [
    ((1, 7), (1, 1)),
    ((7, 1), (1, 1)),
    ((5, 5), (1, 1)),
    ((5, 5), (2, 1)),
    ((5, 5), (4, 1)),
    ((5, 5), (8, 1)),
    ((5, 5), (16, 1)),
]


def sync(x):
    float(jax.device_get(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32)))


def timed(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def build(folded: bool, with_bn: bool, act: str):
    from voicesplit_tpu.ops.conv_fold import (
        conv2d_folded, fold_input, folded_batch_norm, unfold_output,
        zero_pad_column,
    )
    from voicesplit_tpu.models.masknet import mish

    acts = {
        "mish": mish,
        "relu": jax.nn.relu,
        "none": lambda x: x,
    }
    a = acts[act]

    def stack(params, x, stats):
        # x: [B, T, F, 1] fp32
        h = x.astype(jnp.bfloat16)
        if folded:
            hf = fold_input(h)
            for i, ((kt, kf), (dt, df)) in enumerate(SPECS):
                k, scale, bias, rm, rv = params[i]
                hf = conv2d_folded(hf, k.astype(jnp.bfloat16), None, (dt, df))
                hf = zero_pad_column(hf, F)
                if with_bn:
                    hf, _, _ = folded_batch_norm(
                        hf, F, scale, bias, rm, rv, use_running_average=False
                    )
                hf = a(hf)
                hf = zero_pad_column(hf, F)
            h = unfold_output(hf, F)
        else:
            for i, ((kt, kf), (dt, df)) in enumerate(SPECS):
                k, scale, bias, rm, rv = params[i]
                pad_t = (kt - 1) * dt // 2
                pad_f = (kf - 1) * df // 2
                h = jax.lax.conv_general_dilated(
                    h, k.astype(jnp.bfloat16), (1, 1),
                    ((pad_t, pad_t), (pad_f, pad_f)),
                    rhs_dilation=(dt, df),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                if with_bn:
                    m = jnp.mean(h.astype(jnp.float32), axis=(0, 1, 2))
                    v = jnp.maximum(
                        jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(0, 1, 2))
                        - jnp.square(m), 0.0)
                    inv = jax.lax.rsqrt(v + 1e-5) * scale
                    h = h * inv.astype(h.dtype) + (bias - m * inv).astype(h.dtype)
                h = a(h)
        return h

    return stack


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F, 1)), jnp.float32)
    params = []
    cin = 1
    for (kt, kf), _ in SPECS:
        k = jnp.asarray(rng.standard_normal((kt, kf, cin, C)) * 0.05, jnp.float32)
        params.append((
            k,
            jnp.ones((C,), jnp.float32),
            jnp.zeros((C,), jnp.float32),
            jnp.zeros((C,), jnp.float32),
            jnp.ones((C,), jnp.float32),
        ))
        cin = C
    ct = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.bfloat16)

    for folded in (True, False):
        for with_bn, act in ((True, "mish"), (False, "mish"), (True, "none"), (False, "none")):
            name = f"folded={int(folded)} bn={int(with_bn)} act={act}"
            stack = build(folded, with_bn, act)

            fwd = jax.jit(lambda p, x: stack(p, x, None))
            try:
                ms_f = timed(fwd, params, x)
                print(f"{name:34s} fwd {ms_f:7.1f} ms", flush=True)
            except Exception as e:
                print(f"{name:34s} fwd FAILED {type(e).__name__}", flush=True)
                continue

            def loss(p, x, ct):
                out = stack(p, x, None)
                # dense cotangent passed as an ARG — closing over it bakes
                # 371 MB into the program (remote compile rejects it)
                return jnp.sum(out * ct).astype(jnp.float32)

            grad = jax.jit(jax.grad(loss))
            try:
                ms_g = timed(grad, params, x, ct)
                print(f"{name:34s} grad(fwd+bwd) {ms_g:7.1f} ms", flush=True)
            except Exception as e:
                print(f"{name:34s} grad FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
