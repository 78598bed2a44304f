"""Diagnose the pallas_lstm backward-parity miss (round-2 VERDICT weakness #1).

Computes dxp/dwhh three ways at the smoke gate's exact shapes
(B=8, T=64, H=400, fp32):

  a. fused Pallas kernel on TPU
  b. lax.scan reference on TPU (as the smoke gate runs it: default matmul
     precision)
  c. lax.scan reference on TPU under `jax.default_matmul_precision('highest')`
  d. float64 lax.scan on CPU — ground truth

and reports each one's max-abs error vs (d).  If err(b) >= err(a), the
Pallas kernel is *more* accurate than the reference it is being gated
against, and the 1.08e-3 miss is the reference's own bf16-pass noise.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from voicesplit_tpu.models.lstm import lstm_scan
from voicesplit_tpu.ops.lstm_pallas import fused_lstm_scan

B, T, H = 8, 64, 400
rng = np.random.default_rng(0)
xp_np = rng.standard_normal((B, T, 4 * H)).astype(np.float32)
whh_np = (rng.standard_normal((H, 4 * H)) * 0.05).astype(np.float32)
h0_np = np.zeros((B, H), np.float32)
c0_np = np.zeros((B, H), np.float32)


def loss(fn, xp, whh, h0, c0):
    out, (hf, cf) = fn(xp, whh, h0, c0)
    return jnp.sum(jnp.sin(out)) + jnp.sum(hf * hf) + jnp.sum(jnp.cos(cf))


def grads(fn, device, dtype):
    dev = jax.devices(device)[0]
    args = [jax.device_put(jnp.asarray(a, dtype), dev)
            for a in (xp_np, whh_np, h0_np, c0_np)]
    g = jax.jit(jax.grad(lambda *a: loss(fn, *a), argnums=(0, 1, 2, 3)),
                device=dev)(*args)
    return [np.asarray(x, np.float64) for x in g]


# (a) pallas on TPU
g_pallas = grads(fused_lstm_scan, jax.default_backend(), jnp.float32)
# (b) scan on TPU, default precision
g_scan = grads(lstm_scan, jax.default_backend(), jnp.float32)
# (c) scan on TPU, highest precision
with jax.default_matmul_precision("highest"):
    g_scan_hi = grads(lstm_scan, jax.default_backend(), jnp.float32)

# (d) float64 ground truth on CPU — x64 enabled LAST (it breaks Mosaic
# index types if on during the Pallas compile)
jax.config.update("jax_enable_x64", True)
g_f64 = grads(lstm_scan, "cpu", jnp.float64)

names = ["dxp", "dwhh", "dh0", "dc0"]
print(f"{'grad':>6} | {'pallas_vs_f64':>14} | {'scan_vs_f64':>12} | "
      f"{'scanHI_vs_f64':>14} | {'pallas_vs_scan':>14}")
for k, name in enumerate(names):
    e_p = np.max(np.abs(g_pallas[k] - g_f64[k]))
    e_s = np.max(np.abs(g_scan[k] - g_f64[k]))
    e_sh = np.max(np.abs(g_scan_hi[k] - g_f64[k]))
    e_ps = np.max(np.abs(g_pallas[k] - g_scan[k]))
    print(f"{name:>6} | {e_p:14.3e} | {e_s:12.3e} | {e_sh:14.3e} | {e_ps:14.3e}")

# also check pallas vs scan-highest (the fair fp32 reference)
print()
for k, name in enumerate(names):
    e = np.max(np.abs(g_pallas[k] - g_scan_hi[k]))
    print(f"pallas_vs_scanHI {name}: {e:.3e}")
