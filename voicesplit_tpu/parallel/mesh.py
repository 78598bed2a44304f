"""Mesh construction: 1 chip → 1 host → N hosts.

The reference has no device parallelism at all (one GPU pinned by env
var, `run_train.sh:1`; SURVEY.md §2.9) — this module *introduces* it the
TPU way: a `jax.sharding.Mesh` over (data, model) axes.  Data parallelism
shards the batch over ``data`` (XLA inserts the gradient psum over ICI);
the wide variant shards LSTM/conv/fc weights over ``model``.

Multi-host: call `initialize_distributed()` before mesh creation; each
host feeds its own batch shard (`voicesplit_tpu.data` shards by host id).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape ``(data, model)``; `data=None` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op when single-process).

    Must run before any other JAX call.  On the CPU backend (the fake
    multi-host cluster used in tests — SURVEY.md §4) cross-process
    collectives need the gloo transport, which single-backend TPU
    slices don't.
    """
    if num_processes and num_processes > 1:
        # NB: don't touch jax.default_backend() here — it would initialize
        # the backends before jax.distributed does.
        platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if "cpu" in str(platforms):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-host batch for host-sharded feeding."""
    n_hosts = max(1, jax.process_count())
    if global_batch % n_hosts:
        raise ValueError(f"global batch {global_batch} not divisible by {n_hosts} hosts")
    return global_batch // n_hosts
