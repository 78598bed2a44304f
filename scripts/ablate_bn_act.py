"""Measure the fused BN+act op at production scale vs its HBM roofline.

One layer's folded activation is [16, 301, 301, 128] bf16 = 371 MB.
Roofline (819 GB/s): fwd = stats read + normalize read/write ≈ 1.35 ms;
bwd = reduce pass (2 reads) + dx pass (2 reads + 1 write) ≈ 2.3 ms.
Prints measured fwd / fwd+bwd per layer so the fusion quality is visible.
Run alone on the chip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from voicesplit_tpu.ops.bn_act import folded_bn_act_train

B, T, Fb, C2 = 16, 301, 301, 128
F = 601


def sync(x):
    float(jax.device_get(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32)))


def timed(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, Fb, C2)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((B, T, Fb, C2)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    fwd = jax.jit(lambda x: folded_bn_act_train(x, scale, bias, F, "mish")[0])
    print(f"copy roundtrip (read+write 371 MB): "
          f"{timed(jax.jit(lambda x: x + jnp.bfloat16(1.0)), x):6.2f} ms", flush=True)
    print(f"fused fwd   (roofline ~1.35): {timed(fwd, x):6.2f} ms", flush=True)

    def loss(x, dy):
        y, _, _ = folded_bn_act_train(x, scale, bias, F, "mish")
        return jnp.sum(y * dy).astype(jnp.float32)

    g = jax.jit(jax.grad(loss))
    print(f"fused f+bwd (roofline ~3.65): {timed(g, x, dy):6.2f} ms", flush=True)

    # unfused reference for the same shapes
    from voicesplit_tpu.ops.conv_fold import folded_batch_norm, zero_pad_column
    from voicesplit_tpu.models.masknet import mish

    def ref_loss(x, dy):
        xz = zero_pad_column(x, F)
        y, _, _ = folded_batch_norm(
            xz, F, scale, bias, jnp.zeros((64,), jnp.float32),
            jnp.ones((64,), jnp.float32), use_running_average=False,
        )
        y = zero_pad_column(mish(y), F)
        return jnp.sum(y * dy).astype(jnp.float32)

    gr = jax.jit(jax.grad(ref_loss))
    print(f"autodiff f+bwd (old path):    {timed(gr, x, dy):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
