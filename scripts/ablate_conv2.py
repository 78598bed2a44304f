"""Remat-policy ablation for the conv stack's BN+mish elementwise chains.

ablate_conv.py showed the folded convs run at raw-conv speed-of-light
(67.5 ms fwd+bwd at B=16) but BN (+33 ms) and mish (+23 ms) elementwise
work makes the production chain 106 ms.  This measures whether
`jax.checkpoint` (recompute-BN/mish-in-backward, save only conv outputs)
recovers the gap before reaching for a fused Pallas elementwise kernel.
Run alone on the chip.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
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


def timed(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def build(mode: str):
    from voicesplit_tpu.ops.conv_fold import (
        conv2d_folded, fold_input, folded_batch_norm, unfold_output,
        zero_pad_column,
    )
    from voicesplit_tpu.models.masknet import mish

    def bn_act(hf, scale, bias, rm, rv):
        hf = zero_pad_column(hf, F)
        hf, _, _ = folded_batch_norm(
            hf, F, scale, bias, rm, rv, use_running_average=False
        )
        hf = mish(hf)
        return zero_pad_column(hf, F)

    if mode == "remat_bn_act":
        bn_act = jax.checkpoint(bn_act)

    def block(hf, p, dil):
        k, scale, bias, rm, rv = p
        hf = conv2d_folded(hf, k.astype(jnp.bfloat16), None, dil)
        return bn_act(hf, scale, bias, rm, rv)

    if mode == "remat_block":
        block = jax.checkpoint(block, static_argnums=(2,))

    def stack(params, x):
        hf = fold_input(x.astype(jnp.bfloat16))
        for i, ((kt, kf), dil) in enumerate(SPECS):
            hf = block(hf, params[i], dil)
        return unfold_output(hf, F)

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

    for mode in ("baseline", "remat_bn_act", "remat_block"):
        stack = build(mode)

        def loss(p, x, ct):
            return jnp.sum(stack(p, x) * ct).astype(jnp.float32)

        grad = jax.jit(jax.grad(loss))
        try:
            ms = timed(grad, params, x, ct)
            print(f"{mode:16s} grad(fwd+bwd) {ms:7.1f} ms", flush=True)
        except Exception as e:
            print(f"{mode:16s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
