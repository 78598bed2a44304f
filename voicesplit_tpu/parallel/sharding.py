"""Sharding rules: batch over ``data``, wide-variant weights over ``model``.

Data parallelism: params replicated, every batch leaf sharded on its
leading axis; under `jit` XLA turns the gradient reduction into a psum
over ICI (SURVEY.md §5's "distributed communication backend" gap —
introduced here, nothing to mirror in the reference).

Model parallelism (wide variant, BASELINE config 4): Megatron-style
column sharding of the LSTM gate dimension and conv output channels,
with fc1 row-sharded to consume the sharded LSTM output. GSPMD inserts
the (small, per-step) collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Longest-match-wins regex → PartitionSpec over the 'model' axis.
_MODEL_RULES = [
    (r".*lstm/(fwd|bwd)_w_ih$", P(None, "model")),  # [in, 4H]: shard gates
    (r".*lstm/(fwd|bwd)_w_hh$", P(None, "model")),  # [H, 4H]: shard gates
    (r".*lstm/(fwd|bwd)_b$", P("model")),  # [4H]
    (r".*conv\d+/Conv_0/kernel$", P(None, None, None, "model")),  # [kt,kf,cin,cout]
    (r".*conv\d+/Conv_0/bias$", P("model")),
    (r".*conv\d+/BatchNorm_0/(scale|bias)$", P("model")),
    (r".*fc1/kernel$", P("model", None)),  # [2H, fc1]: consume sharded LSTM out
    (r".*fc2/kernel$", P(None, None)),
]


def param_partition_spec(params: Any, model_parallel: bool) -> Any:
    """Pytree of PartitionSpecs for `params`.

    `model_parallel=False` replicates everything (pure DP)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path) -> P:
        if not model_parallel:
            return P()
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        for pattern, spec in _MODEL_RULES:
            if re.match(pattern, name):
                return spec
        return P()

    specs = {jax.tree_util.keystr(path): spec_for(path) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: specs[jax.tree_util.keystr(path)], params
    )


def batch_sharding(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, NamedSharding]:
    """Leading-axis ``data`` sharding for every batch leaf."""
    return {
        k: NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        for k, v in batch.items()
    }


def put_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Place a host-local batch on the mesh, data-sharded on axis 0.

    Single-process: plain `device_put`.  Multi-process (each host feeds
    its own shard of the global batch, the way the reference's 14
    DataLoader workers feed one GPU — `utils/dataset.py:60-68` — scaled
    to hosts): assemble a global `jax.Array` from per-process shards
    without any cross-host data movement.
    """
    shardings = batch_sharding(mesh, batch)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(shardings[k], np.asarray(v))
        for k, v in batch.items()
    }


def shard_train_state(state, mesh: Mesh, model_parallel: bool = False):
    """Place a TrainState on the mesh.

    Params follow the partition rules; optimizer moments (which mirror
    param shapes — Adam's mu/nu) inherit the matching param's spec by
    shape lookup; everything else is replicated.
    """
    param_specs = param_partition_spec(state.params, model_parallel)
    multiprocess = jax.process_count() > 1

    def put(x, spec):
        sh = NamedSharding(mesh, spec)
        if multiprocess:
            # every host holds the full (identically-initialized) value;
            # each contributes only its addressable shards.  global_shape
            # is pinned so inference never concatenates across processes.
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x), global_shape=np.shape(x)
            )
        return jax.device_put(x, sh)

    params = jax.tree.map(put, state.params, param_specs)

    # shape → spec lookup so opt-state moments shard like their params
    by_shape: Dict[tuple, P] = {}
    for leaf, spec in zip(jax.tree.leaves(state.params), jax.tree.leaves(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    )):
        by_shape.setdefault(tuple(np.shape(leaf)), spec)

    def put_like_param(x):
        return put(x, by_shape.get(tuple(np.shape(x)), P()))

    return type(state)(
        step=put(state.step, P()),
        params=params,
        batch_stats=jax.tree.map(lambda x: put(x, P()), state.batch_stats),
        opt_state=jax.tree.map(put_like_param, state.opt_state),
    )
