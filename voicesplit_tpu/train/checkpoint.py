"""Checkpointing: msgpack pytrees with step + config + data-iterator state.

The reference saves ``{'model', 'optimizer', 'step', 'config_str'}`` every
`checkpoint_interval` steps (`train.py:125-132`) and supports partial
warm-start restores that filter by name/shape and honor `reinit_layers`
(`set_init_dict`, `utils/generic_utils.py:647-679`).  Same capabilities
here over flax msgpack serialization, plus the data-iterator state so a
preempted run resumes mid-epoch deterministically (SURVEY.md §5's
failure-recovery gap).
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization
import jax
import numpy as np

from voicesplit_tpu.config import Config, load_config_from_str
from voicesplit_tpu.data.dataset import IteratorState
from voicesplit_tpu.train.state import TrainState

CKPT_PATTERN = "checkpoint_%d.msgpack"
_CKPT_RE = re.compile(r"checkpoint_(\d+)\.msgpack$")


def save_checkpoint(
    log_dir: str,
    state: TrainState,
    config: Config,
    data_state: Optional[IteratorState] = None,
    keep: Optional[int] = None,
) -> str:
    """Write ``checkpoint_<step>.msgpack``; optionally prune old ones."""
    os.makedirs(log_dir, exist_ok=True)
    step = int(jax.device_get(state.step))
    to_sd = flax.serialization.to_state_dict  # tuples/namedtuples → dicts
    payload = {
        "model": to_sd(jax.device_get(state.params)),
        "batch_stats": to_sd(jax.device_get(state.batch_stats)),
        "optimizer": to_sd(jax.device_get(state.opt_state)),
        "step": step,
        "config_str": config.to_json(),
        "data_state": (data_state or IteratorState()).to_dict(),
    }
    path = os.path.join(log_dir, CKPT_PATTERN % step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)  # atomic — a preempted host never sees a torn file
    if keep:
        for old in list_checkpoints(log_dir)[:-keep]:
            os.remove(old)
    return path


class AsyncCheckpointer:
    """One-in-flight background checkpoint writer.

    ``jax.device_get`` runs synchronously in `save` — the caller's next
    train step invalidates donated state buffers, so the host copy must
    exist before control returns — but msgpack serialization and the
    disk write (the slow, device-independent part) run in a daemon
    worker thread.  At most one write is in flight: a new `save` joins
    the previous one first, and `wait()` must be called before process
    exit (the trainer does on fit() return and on the preemption path)
    so a graceful shutdown never drops the final checkpoint.
    """

    def __init__(self):
        self._thread: Optional["threading.Thread"] = None
        self._error: Optional[BaseException] = None

    def save(
        self,
        log_dir: str,
        state: TrainState,
        config: Config,
        data_state: Optional[IteratorState] = None,
        keep: Optional[int] = None,
    ) -> str:
        import threading

        self.wait()
        os.makedirs(log_dir, exist_ok=True)
        step = int(jax.device_get(state.step))
        to_sd = flax.serialization.to_state_dict
        payload = {
            "model": to_sd(jax.device_get(state.params)),
            "batch_stats": to_sd(jax.device_get(state.batch_stats)),
            "optimizer": to_sd(jax.device_get(state.opt_state)),
            "step": step,
            "config_str": config.to_json(),
            "data_state": (data_state or IteratorState()).to_dict(),
        }
        path = os.path.join(log_dir, CKPT_PATTERN % step)

        def _write():
            try:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(flax.serialization.msgpack_serialize(payload))
                os.replace(tmp, path)
                if keep:
                    for old in list_checkpoints(log_dir)[:-keep]:
                        os.remove(old)
            except BaseException as e:  # surfaced on the next save/wait
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="ckpt-writer", daemon=True
        )
        self._thread.start()
        return path

    def wait(self) -> None:
        """Join the in-flight write; re-raise any writer error loudly."""
        if self._thread is not None and self._thread.is_alive():
            self._thread.join()
        self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from e


def list_checkpoints(log_dir: str) -> List[str]:
    """All checkpoints in `log_dir`, sorted by step."""
    hits = glob(os.path.join(log_dir, "checkpoint_*.msgpack"))
    with_steps = []
    for h in hits:
        m = _CKPT_RE.search(h)
        if m:
            with_steps.append((int(m.group(1)), h))
    return [h for _, h in sorted(with_steps)]


def latest_checkpoint(log_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(log_dir)
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Raw payload dict: model/batch_stats/optimizer/step/config_str/data_state."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def config_from_checkpoint(path: str) -> Config:
    """Recover the embedded config (reference `test.py:87-89`)."""
    return load_config_from_str(load_checkpoint(path)["config_str"])


def load_model_variables(config: Config, checkpoint_path: str, streaming: bool = False):
    """Inference-ready ``{"params", "batch_stats"}`` from a checkpoint
    (fresh init as the deserialization template — the shared tail of
    every inference CLI)."""
    import jax
    import numpy as np_

    from voicesplit_tpu.dsp.processor import AudioProcessor
    from voicesplit_tpu.models.masknet import make_masknet

    ap = AudioProcessor(config.audio)
    model = make_masknet(config, streaming=streaming)
    payload = load_checkpoint(checkpoint_path)
    init_vars = model.init(
        jax.random.PRNGKey(0),
        np_.zeros((1, 80, ap.num_freq), np_.float32),
        np_.zeros((1, config.model.emb_dim), np_.float32),
    )
    params = flax.serialization.from_state_dict(init_vars["params"], payload["model"])
    # from_state_dict does NOT validate shapes; a mismatched checkpoint
    # (e.g. a BiLSTM one fed to streaming=True) would otherwise surface
    # as a confusing ScopeParamShapeError deep inside apply
    bad = [
        f"{jax.tree_util.keystr(path)}: checkpoint {np_.shape(got)} vs model {np_.shape(want)}"
        for (path, got), want in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree.leaves(init_vars["params"]),
        )
        if np_.shape(got) != np_.shape(want)
    ]
    if bad:
        raise ValueError(
            f"checkpoint {checkpoint_path!r} does not fit the "
            f"{'streaming ' if streaming else ''}model: " + "; ".join(bad)
        )
    return {
        "params": params,
        "batch_stats": flax.serialization.from_state_dict(
            init_vars.get("batch_stats", {}), payload["batch_stats"]
        ),
    }


def restore_train_state(
    payload: Dict[str, Any], template: TrainState, partial: bool = False,
    reinit_layers: Optional[List[str]] = None,
) -> Tuple[TrainState, IteratorState]:
    """Rebuild a `TrainState` from a payload.

    `partial=True` applies the reference's warm-start semantics: keep the
    template's fresh init and copy over only leaves that exist with
    matching shapes, skipping any whose path matches `reinit_layers`
    (reference `set_init_dict`, `utils/generic_utils.py:647-679`); the
    optimizer state is reset in that case.
    """
    if partial:
        params = partial_restore(template.params, payload["model"], reinit_layers)
        return (
            TrainState(
                step=template.step,
                params=params,
                batch_stats=template.batch_stats,
                opt_state=template.opt_state,
            ),
            IteratorState(),
        )
    params = flax.serialization.from_state_dict(template.params, payload["model"])
    batch_stats = flax.serialization.from_state_dict(
        template.batch_stats, payload["batch_stats"]
    )
    opt_state = flax.serialization.from_state_dict(template.opt_state, payload["optimizer"])
    state = TrainState(
        step=np.int32(payload["step"]),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    data_state = IteratorState.from_dict(
        payload.get("data_state", IteratorState().to_dict())
    )
    return state, data_state


def bilstm_to_streaming_sd(model_sd: Dict[str, Any], lstm_dim: int) -> Dict[str, Any]:
    """BiLSTM model state-dict → streaming (UniLSTM) one.

    The deployable streaming/causal model (BASELINE config 5) replaces the
    BiLSTM with a forward-only LSTM, so its ``lstm`` has only ``fwd_*``
    params and ``fc1`` reads ``[H]`` instead of ``[2H]`` features.  Seeding
    from a trained offline BiLSTM (the standard distillation shortcut):

    - ``lstm.fwd_*`` copied verbatim;
    - ``fc1.kernel[:H] + fc1.kernel[H:]`` — the BiLSTM head computes
      ``h_f @ W_f + h_b @ W_b``; collapsing to ``h_f @ (W_f + W_b)`` is
      exact in the limit ``h_b ≈ h_f`` and preserves the output scale
      (unlike taking ``W_f`` alone, which halves the head's input drive);
    - everything else (convs, fc2, BN) copied verbatim.
    """
    out = {k: v for k, v in model_sd.items() if k not in ("lstm", "fc1")}
    lstm = model_sd["lstm"]
    out["lstm"] = {
        "fwd_w_ih": lstm["fwd_w_ih"],
        "fwd_w_hh": lstm["fwd_w_hh"],
        "fwd_b": lstm["fwd_b"],
    }
    k = np.asarray(model_sd["fc1"]["kernel"])
    if k.shape[0] != 2 * lstm_dim:
        raise ValueError(
            f"fc1 kernel rows {k.shape[0]} != 2*lstm_dim {2 * lstm_dim}: "
            "not a BiLSTM checkpoint"
        )
    out["fc1"] = {
        "kernel": k[:lstm_dim] + k[lstm_dim:],
        "bias": np.asarray(model_sd["fc1"]["bias"]),
    }
    return out


def convert_bilstm_checkpoint_to_streaming(
    ckpt_path: str,
    out_dir: str,
    causal: Optional[bool] = None,
) -> str:
    """Offline-BiLSTM checkpoint → a streaming-model checkpoint ready for
    causal fine-tuning (`Trainer(..., streaming=True)`) or serving.

    `causal` overrides ``config.model.causal`` in the emitted checkpoint
    (default True: the zero-lookahead deployment geometry).  The step
    resets to 0 (it is a warm START, not a resume) and the optimizer
    state is fresh.  Returns the written path.
    """
    import jax

    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train.state import create_train_state, make_optimizer

    payload = load_checkpoint(ckpt_path)
    config = load_config_from_str(payload["config_str"])
    config.model.causal = True if causal is None else causal
    model = make_masknet(config, streaming=True)
    tx = make_optimizer(config)
    F = config.audio.active.num_freq
    template = create_train_state(config, model, jax.random.PRNGKey(0), (1, 16, F), tx)
    model_sd = bilstm_to_streaming_sd(payload["model"], config.model.lstm_dim)
    params = flax.serialization.from_state_dict(template.params, model_sd)
    batch_stats = flax.serialization.from_state_dict(
        template.batch_stats, payload["batch_stats"]
    )
    state = template.replace(
        step=np.int32(0), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return save_checkpoint(out_dir, state, config)


def partial_restore(init_params, loaded, reinit_layers: Optional[List[str]] = None):
    """Name+shape-filtered merge of `loaded` into `init_params`."""
    reinit_layers = reinit_layers or []
    flat_init = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(init_params), sep="/"
    )
    flat_loaded = flax.traverse_util.flatten_dict(loaded, sep="/")
    merged = {}
    for k, v in flat_init.items():
        take = (
            k in flat_loaded
            and tuple(np.shape(flat_loaded[k])) == tuple(np.shape(v))
            and not any(pat in k for pat in reinit_layers)
        )
        merged[k] = np.asarray(flat_loaded[k]) if take else v
    merged_tree = flax.traverse_util.unflatten_dict(merged, sep="/")
    return flax.serialization.from_state_dict(init_params, merged_tree)
