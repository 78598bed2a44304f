"""Import reference torch checkpoints (``checkpoint_%d.pt``) into this framework.

The reference saves ``{'model': state_dict, 'optimizer': state_dict,
'step': int, 'config_str': str(AttrDict)}`` (reference `train.py:126-132`)
for the `VoiceFilter` / `VoiceSplit` topology
(`models/voicefilter/model.py:11-90`):

- ``conv.{i}.weight/bias`` — 8 Conv2d layers inside one ``nn.Sequential``
  interleaved with ZeroPad2d / BatchNorm2d / activation modules; the
  Conv2d modules sit at sequence indices (1, 5, 9, 13, 17, 21, 25, 28)
  and the BatchNorm2d modules at (2, 6, 10, 14, 18, 22, 26, 29).
- ``lstm.weight_ih_l0[_reverse]`` ``[4H, in]``, ``weight_hh_l0[_reverse]``
  ``[4H, H]``, ``bias_ih_l0[_reverse]`` + ``bias_hh_l0[_reverse]`` — a
  bidirectional ``nn.LSTM`` with torch's ``[i, f, g, o]`` gate chunking
  (same gate order as `models/lstm.py`, which keeps a single fused bias).
- ``fc1.weight [600, 800]``, ``fc2.weight [601, 600]`` + biases.

Two representation changes are applied on import:

1. **Layout**: torch convs are NCHW ``[out, in, kt, kf]``; our NHWC convs
   are ``[kt, kf, in, out]`` (transpose). Linear/LSTM weights transpose
   ``[out, in] -> [in, out]``.
2. **Flatten permutation**: the reference flattens conv features
   channel-major (index ``c*F + f``, `model.py:73-75`); we flatten
   frequency-major (``f*C + c``, free from NHWC — see
   `models/masknet.py::conv_features`). The BiLSTM input-projection ROWS
   for the first ``C*F`` inputs are therefore permuted so the imported
   model computes the identical function.

`tests/test_torch_parity.py` builds the reference topology in torch from
this spec, pushes one random init through both frameworks, and pins mask
agreement — the proof that an imported reference checkpoint IS the
reference model.
"""

from __future__ import annotations

import ast
import json
from typing import Any, Dict, Optional, Tuple

import numpy as np

from voicesplit_tpu.config import Config, load_config_from_str

# nn.Sequential indices of the Conv2d / BatchNorm2d modules in the
# reference conv stack (`models/voicefilter/model.py:17-54`).
TORCH_CONV_IDX = (1, 5, 9, 13, 17, 21, 25, 28)
TORCH_BN_IDX = (2, 6, 10, 14, 18, 22, 26, 29)


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (no torch import needed
    unless the input actually is a tensor)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def flatten_permutation(num_freq: int, channels: int) -> np.ndarray:
    """``perm[j]`` = reference flat index feeding OUR flat feature j.

    Our conv features flatten as ``j = f*C + c``; the reference's as
    ``c*F + f`` (`model.py:73-75`).  ``our_w_ih[j] = ref_w_ih[perm[j]]``.
    """
    f = np.arange(num_freq * channels) // channels
    c = np.arange(num_freq * channels) % channels
    return c * num_freq + f


def convert_torch_state_dict(
    sd: Dict[str, Any],
    num_freq: int = 601,
    conv_out_channels: int = 8,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference torch ``state_dict`` -> ``(params, batch_stats)`` nested
    dicts matching `MaskNet`'s variable tree (feedable to
    ``flax.serialization.from_state_dict`` or used directly)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for i, (ci, bi) in enumerate(zip(TORCH_CONV_IDX, TORCH_BN_IDX)):
        name = f"conv{i + 1}"
        w = _np(sd[f"conv.{ci}.weight"])  # [out, in, kt, kf]
        params[name] = {
            "Conv_0": {
                "kernel": w.transpose(2, 3, 1, 0),  # -> [kt, kf, in, out]
                "bias": _np(sd[f"conv.{ci}.bias"]),
            },
            "BatchNorm_0": {
                "scale": _np(sd[f"conv.{bi}.weight"]),
                "bias": _np(sd[f"conv.{bi}.bias"]),
            },
        }
        batch_stats[name] = {
            "BatchNorm_0": {
                "mean": _np(sd[f"conv.{bi}.running_mean"]),
                "var": _np(sd[f"conv.{bi}.running_var"]),
            }
        }

    perm = flatten_permutation(num_freq, conv_out_channels)
    n_feat = num_freq * conv_out_channels

    def lstm_dir(suffix: str) -> Dict[str, np.ndarray]:
        w_ih = _np(sd[f"lstm.weight_ih_l0{suffix}"]).T  # [in, 4H]
        w_hh = _np(sd[f"lstm.weight_hh_l0{suffix}"]).T  # [H, 4H]
        b = _np(sd[f"lstm.bias_ih_l0{suffix}"]) + _np(sd[f"lstm.bias_hh_l0{suffix}"])
        # permute the conv-feature rows into our f*C+c order; the trailing
        # emb_dim rows (the d-vector concat) are order-identical
        w_ih = np.concatenate([w_ih[:n_feat][perm], w_ih[n_feat:]], axis=0)
        return {"w_ih": w_ih, "w_hh": w_hh, "b": b}

    fwd, bwd = lstm_dir(""), lstm_dir("_reverse")
    params["lstm"] = {
        "fwd_w_ih": fwd["w_ih"], "fwd_w_hh": fwd["w_hh"], "fwd_b": fwd["b"],
        "bwd_w_ih": bwd["w_ih"], "bwd_w_hh": bwd["w_hh"], "bwd_b": bwd["b"],
    }
    for fc in ("fc1", "fc2"):
        params[fc] = {"kernel": _np(sd[f"{fc}.weight"]).T, "bias": _np(sd[f"{fc}.bias"])}
    return params, batch_stats


def export_torch_state_dict(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    num_freq: int = 601,
    conv_out_channels: int = 8,
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_torch_state_dict`: our variable trees -> a
    reference-keyed torch-style state dict (numpy values), so models
    trained here can be served by the reference implementation."""
    import flax.serialization

    params = flax.serialization.to_state_dict(params)
    batch_stats = flax.serialization.to_state_dict(batch_stats)
    sd: Dict[str, np.ndarray] = {}
    for i, (ci, bi) in enumerate(zip(TORCH_CONV_IDX, TORCH_BN_IDX)):
        name = f"conv{i + 1}"
        sd[f"conv.{ci}.weight"] = _np(params[name]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"conv.{ci}.bias"] = _np(params[name]["Conv_0"]["bias"])
        sd[f"conv.{bi}.weight"] = _np(params[name]["BatchNorm_0"]["scale"])
        sd[f"conv.{bi}.bias"] = _np(params[name]["BatchNorm_0"]["bias"])
        sd[f"conv.{bi}.running_mean"] = _np(batch_stats[name]["BatchNorm_0"]["mean"])
        sd[f"conv.{bi}.running_var"] = _np(batch_stats[name]["BatchNorm_0"]["var"])
        sd[f"conv.{bi}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    perm = flatten_permutation(num_freq, conv_out_channels)
    inv = np.argsort(perm)
    n_feat = num_freq * conv_out_channels
    for suffix, pfx in (("", "fwd"), ("_reverse", "bwd")):
        w_ih = _np(params["lstm"][f"{pfx}_w_ih"])
        w_ih = np.concatenate([w_ih[:n_feat][inv], w_ih[n_feat:]], axis=0)
        sd[f"lstm.weight_ih_l0{suffix}"] = w_ih.T
        sd[f"lstm.weight_hh_l0{suffix}"] = _np(params["lstm"][f"{pfx}_w_hh"]).T
        b = _np(params["lstm"][f"{pfx}_b"])
        sd[f"lstm.bias_ih_l0{suffix}"] = b
        sd[f"lstm.bias_hh_l0{suffix}"] = np.zeros_like(b)
    for fc in ("fc1", "fc2"):
        sd[f"{fc}.weight"] = _np(params[fc]["kernel"]).T
        sd[f"{fc}.bias"] = _np(params[fc]["bias"])
    return sd


def parse_reference_config_str(text: str) -> Config:
    """Parse a checkpoint-embedded config string.

    Ours is canonical JSON; the reference's is ``str(AttrDict)`` — a
    Python dict repr (it reparses with yaml, `generic_utils.py:575-581`).
    Unknown top-level keys (the reference's `copy_config_file` can inject
    extras) are dropped with a notice rather than rejected.
    """
    try:
        return load_config_from_str(text)
    except (json.JSONDecodeError, ValueError):
        pass
    data = ast.literal_eval(text)
    if not isinstance(data, dict):
        raise ValueError(f"config_str is not a mapping: {type(data)}")
    import dataclasses

    known = {f.name for f in dataclasses.fields(Config)}
    dropped = sorted(set(data) - known)
    if dropped:
        print(f" > import: dropping unknown config keys {dropped}")
    return Config.from_dict({k: v for k, v in data.items() if k in known})


def import_torch_checkpoint(
    pt_path: str,
    out_dir: str,
    config: Optional[Config] = None,
) -> str:
    """Reference ``checkpoint_%d.pt`` -> our ``checkpoint_%d.msgpack``.

    The optimizer state is NOT translated (torch Adam moments live in the
    reference's flattened key space; a fresh optax state is initialized
    instead — warm-starting the moments buys nothing at these scales).
    Returns the written msgpack path.
    """
    import jax
    import torch

    from voicesplit_tpu.models.masknet import make_masknet
    from voicesplit_tpu.train.checkpoint import save_checkpoint
    from voicesplit_tpu.train.state import create_train_state, make_optimizer

    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    if config is None:
        if "config_str" not in payload:
            raise ValueError(
                f"{pt_path!r} has no embedded config_str; pass --config"
            )
        config = parse_reference_config_str(str(payload["config_str"]))
    params_sd, batch_stats_sd = convert_torch_state_dict(
        payload["model"],
        num_freq=config.audio.active.num_freq,
        conv_out_channels=config.model.conv_out_channels,
    )

    import flax.serialization

    model = make_masknet(config)
    tx = make_optimizer(config)
    F = config.audio.active.num_freq
    template = create_train_state(
        config, model, jax.random.PRNGKey(0), (1, 16, F), tx
    )
    params = flax.serialization.from_state_dict(template.params, params_sd)
    batch_stats = flax.serialization.from_state_dict(template.batch_stats, batch_stats_sd)
    state = template.replace(
        step=np.int32(int(payload.get("step", 0))),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return save_checkpoint(out_dir, state, config)
