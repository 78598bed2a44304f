"""FULL-MODEL numerical parity with the reference implementation.

Builds the reference `VoiceFilter`/`VoiceSplit` topology in torch from its
spec (reference `models/voicefilter/model.py:11-90`: 8 ZeroPad2d+Conv2d+
BatchNorm2d+act layers, BiLSTM, fc1+ReLU, fc2+sigmoid), pushes ONE random
initialization through both frameworks via the importer
(`train/torch_import.py`), and pins mask agreement — for relu AND mish,
for the default folded conv path AND the plain `nn.Conv` path.  This is
what proves an imported reference checkpoint IS the reference model
(including the f*C+c vs c*F+f flatten-permutation handling,
`models/masknet.py::conv_features`).

Also round-trips a synthetic reference ``checkpoint_%d.pt`` through
`cli/import_torch` into our msgpack format and re-exports with
`export_torch_state_dict`.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from voicesplit_tpu.models.masknet import MaskNet
from voicesplit_tpu.models.torch_ref import build_reference_torch_model
from voicesplit_tpu.train.torch_import import (
    convert_torch_state_dict,
    export_torch_state_dict,
    flatten_permutation,
)

B, T, F, EMB, H = 2, 49, 601, 256, 400


def randomize_torch_model(model: nn.Module, seed: int = 0) -> None:
    """Random weights everywhere, including BN affine params and RUNNING
    statistics (fresh-init mean=0/var=1 would mask a stats-mapping bug)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.08, 0.08, generator=g))
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.empty_like(m.running_mean).uniform_(-0.5, 0.5, generator=g)
                )
                m.running_var.copy_(
                    torch.empty_like(m.running_var).uniform_(0.5, 2.0, generator=g)
                )


def _inputs(seed: int = 1):
    rng = np.random.default_rng(seed)
    spec = rng.uniform(0, 1, (B, T, F)).astype(np.float32)
    emb = rng.standard_normal((B, EMB)).astype(np.float32)
    return spec, emb


@pytest.mark.parametrize("activation", ["relu", "mish"])
@pytest.mark.parametrize("conv_path", ["folded", "plain"])
def test_full_model_matches_reference_topology(activation, conv_path, monkeypatch):
    monkeypatch.setenv("VOICESPLIT_FOLDED_CONV", "1" if conv_path == "folded" else "0")
    ref = build_reference_torch_model(activation)
    randomize_torch_model(ref, seed=3)
    ref.eval()
    spec, emb = _inputs()
    with torch.no_grad():
        ref_mask = ref(torch.from_numpy(spec), torch.from_numpy(emb)).numpy()

    params, batch_stats = convert_torch_state_dict(ref.state_dict(), num_freq=F)
    model = MaskNet(activation=activation, compute_dtype=jnp.float32)
    mask = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(spec), jnp.asarray(emb), train=False,
    )
    np.testing.assert_allclose(np.asarray(mask), ref_mask, atol=1e-4)


def test_flatten_permutation_is_inverse_consistent():
    perm = flatten_permutation(F, 8)
    assert sorted(perm.tolist()) == list(range(8 * F))
    # our index j = f*C + c must read reference index c*F + f
    f, c = 17, 5
    assert perm[f * 8 + c] == c * F + f


def test_export_roundtrip(monkeypatch):
    """export_torch_state_dict(convert(sd)) reproduces the torch model."""
    ref = build_reference_torch_model("relu")
    randomize_torch_model(ref, seed=7)
    params, batch_stats = convert_torch_state_dict(ref.state_dict(), num_freq=F)
    sd = export_torch_state_dict(params, batch_stats, num_freq=F)
    orig = ref.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if "bias_hh" in k:  # fused into bias_ih on import; split 100/0 on export
            combined = sd[k.replace("bias_hh", "bias_ih")] + v
            expected = (orig[k.replace("bias_hh", "bias_ih")] + orig[k]).numpy()
            np.testing.assert_allclose(combined, expected, atol=1e-6)
            continue
        if "bias_ih" in k:
            continue
        np.testing.assert_allclose(v, orig[k].numpy(), atol=1e-6, err_msg=k)
    # and the re-exported weights drive the torch model to the same output
    ref2 = build_reference_torch_model("relu")
    ref2.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})
    ref.eval(), ref2.eval()
    spec, emb = _inputs(2)
    with torch.no_grad():
        m1 = ref(torch.from_numpy(spec), torch.from_numpy(emb)).numpy()
        m2 = ref2(torch.from_numpy(spec), torch.from_numpy(emb)).numpy()
    np.testing.assert_allclose(m1, m2, atol=1e-6)


def test_import_torch_checkpoint_cli(tmp_path):
    """A synthetic reference checkpoint_%d.pt (the exact payload the
    reference writes, `train.py:126-132`, with config_str = str(AttrDict)
    i.e. a Python dict repr) imports via the CLI and round-trips through
    our serving path with identical masks."""
    from voicesplit_tpu.cli.import_torch import main as import_main
    from voicesplit_tpu.config import Config
    from voicesplit_tpu.train.checkpoint import (
        config_from_checkpoint,
        load_checkpoint,
        load_model_variables,
    )

    ref = build_reference_torch_model("mish")
    randomize_torch_model(ref, seed=11)
    ref.eval()
    cfg_dict = Config(model_name="voicesplit").to_dict()
    pt = tmp_path / "checkpoint_1234.pt"
    torch.save(
        {
            "model": ref.state_dict(),
            "optimizer": {},
            "step": 1234,
            "config_str": str(cfg_dict),  # reference stores str(AttrDict)
        },
        pt,
    )
    out = tmp_path / "imported"
    import_main(["--torch_checkpoint", str(pt), "--output_dir", str(out)])

    ckpts = sorted(out.glob("checkpoint_*.msgpack"))
    assert len(ckpts) == 1 and "1234" in ckpts[0].name
    payload = load_checkpoint(str(ckpts[0]))
    assert int(payload["step"]) == 1234
    config = config_from_checkpoint(str(ckpts[0]))
    assert config.model_name == "voicesplit"

    variables = load_model_variables(config, str(ckpts[0]))
    model = MaskNet(activation="mish", compute_dtype=jnp.float32)
    spec, emb = _inputs(4)
    mask = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(spec), jnp.asarray(emb), train=False,
    )
    with torch.no_grad():
        ref_mask = ref(torch.from_numpy(spec), torch.from_numpy(emb)).numpy()
    np.testing.assert_allclose(np.asarray(mask), ref_mask, atol=1e-4)
