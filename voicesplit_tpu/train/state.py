"""Train state and optimizer construction.

The reference supports Adam only (`train.py:33-37`, raising otherwise);
we keep that contract (plus optional gradient clipping, a TPU-native
addition) via optax.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from voicesplit_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    """Pytree of everything the optimizer step mutates."""

    step: jnp.ndarray  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config: Config) -> optax.GradientTransformation:
    tc = config.train_config
    if tc.optimizer.lower() != "adam":
        raise ValueError(
            f"unsupported optimizer {tc.optimizer!r} (the reference supports adam only)"
        )
    lr = tc.learning_rate
    if tc.lr_decay_steps:
        lr = optax.cosine_decay_schedule(
            tc.learning_rate, tc.lr_decay_steps, alpha=tc.lr_decay_alpha
        )
    if tc.weight_decay:
        # decoupled weight decay on matmul kernels only: decaying BN
        # scale/bias or biases regularizes nothing useful and skews the
        # normalization statistics
        tx = optax.adamw(lr, weight_decay=tc.weight_decay, mask=_decay_mask)
    else:
        tx = optax.adam(lr)
    if tc.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), tx)
    return tx


def _decay_mask(params):
    """True for weight-matrix leaves (kernel/Dense/LSTM weights), False
    for biases and BatchNorm scale — the standard AdamW exclusion."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)

    def is_vector(name: str) -> bool:
        # bias / BatchNorm scale+bias / LSTM gate biases (fwd_b, bwd_b)
        return (name.endswith("bias") or name == "scale" or name == "b"
                or name.endswith("_b"))

    return tu.unflatten_dict({k: not is_vector(k[-1]) for k in flat})


def create_train_state(
    config: Config,
    model,
    rng: jax.Array,
    spec_shape,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    """Initialize params/batch-stats/optimizer for a given input shape."""
    B, T, F = spec_shape
    variables = model.init(
        rng,
        jnp.zeros((B, T, F), jnp.float32),
        jnp.zeros((B, config.model.emb_dim), jnp.float32),
    )
    tx = tx or make_optimizer(config)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
