"""AOT export: serialized, servable separation programs (StableHLO).

The reference deploys by shipping a torch checkpoint plus the whole
Python stack (`test.py:25-100` rebuilds model + audio processor from
source).  TPU-native serving wants the opposite: ONE self-contained
artifact — the full separation computation (STFT → mask net → masked
iSTFT) with the weights baked in as constants — that a serving binary
can load and run with zero Python model code, via `jax.export`'s
portable StableHLO serialization.

- `export_separator`: wav [B, L] + d-vector [B, E] → separated wav
  [B, L], batch dimension symbolic (any B at serve time), L fixed by
  `seconds` (static shapes are what make the program one XLA binary).
- `export_streaming`: the fixed-shape streaming chunk step with the
  `StreamState` flattened to a tuple — a stateless program the server
  threads state through, chunk by chunk.
- `load_exported`: deserialize + wrap for calling from JAX (the
  round-trip used by the tests; a C++/serving stack would instead feed
  the StableHLO to PJRT directly).

Artifacts are multi-platform when requested (e.g. ``platforms=("tpu",
"cpu")``) — the export carries one lowering per platform.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet


def make_e2e_separation_fn(config: Config, variables, synthesis_window: str = "hann"):
    """``fn(mixed_wav [B, L], emb [B, E]) -> separated [B, L]`` — the
    whole eval-mode pipeline as one jittable function (weights closed
    over; mixture-phase inversion, reference `generic_utils.py:504`)."""
    model = make_masknet(config)
    ap = AudioProcessor(config.audio, synthesis_window=synthesis_window)

    def fn(mixed_wav, emb):
        spec, phase = ap.wav2spec_batch(mixed_wav)
        mask = model.apply(variables, spec, emb, train=False)
        est = mask * spec
        return ap.spec2wav_batch(est, phase, length=mixed_wav.shape[-1])

    return fn


def export_separator(
    config: Config,
    variables,
    seconds: float = 3.0,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    batch_size: int = 1,
) -> bytes:
    """Serialize the e2e separation program.  ``symbolic_batch`` leaves
    B free at serve time; otherwise it is pinned to `batch_size`."""
    import os

    ap = AudioProcessor(config.audio)
    L = int(ap.sample_rate * seconds)
    E = config.model.emb_dim
    if symbolic_batch:
        (B,) = jexport.symbolic_shape("b")
    else:
        B = batch_size
    fn = make_e2e_separation_fn(config, variables)
    # Pallas blocks can't be shape-polymorphic — trace symbolic-batch
    # exports through the lax.scan LSTM (same numerics; a fixed-batch
    # export keeps the fused kernel)
    saved = os.environ.get("VOICESPLIT_PALLAS_LSTM")
    if symbolic_batch:
        os.environ["VOICESPLIT_PALLAS_LSTM"] = "0"
    try:
        exp = jexport.export(
            jax.jit(fn), platforms=list(platforms) if platforms else None
        )(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, E), jnp.float32),
        )
    finally:
        if symbolic_batch:
            if saved is None:
                os.environ.pop("VOICESPLIT_PALLAS_LSTM", None)
            else:
                os.environ["VOICESPLIT_PALLAS_LSTM"] = saved
    return bytes(exp.serialize())


def export_streaming(
    config: Config,
    variables,
    chunk_frames: int = 50,
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[bytes, dict]:
    """Serialize the streaming chunk step (state flattened to a tuple).

    Returns ``(artifact_bytes, manifest)`` where the manifest documents
    the state layout, chunk size, and latency so a server can allocate
    zero state and thread it: ``(*state, out) = step(*state, samples,
    emb)``."""
    from voicesplit_tpu.streaming import StreamingSeparator

    sep = StreamingSeparator(config, variables, chunk_frames=chunk_frames)
    state0 = sep.init_state(batch_size)
    state_leaves = jax.tree.leaves(state0)
    treedef = jax.tree.structure(state0)

    def chunk_fn(*args):
        state = jax.tree.unflatten(treedef, args[: len(state_leaves)])
        samples, emb = args[len(state_leaves) :]
        new_state, out = sep._chunk_step_impl(state, samples, emb)
        return tuple(jax.tree.leaves(new_state)) + (out,)

    specs = tuple(
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state_leaves
    ) + (
        jax.ShapeDtypeStruct((batch_size, sep.chunk_samples), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, config.model.emb_dim), jnp.float32),
    )
    exp = jexport.export(
        jax.jit(chunk_fn), platforms=list(platforms) if platforms else None
    )(*specs)
    manifest = {
        "kind": "streaming_chunk_step",
        "batch_size": batch_size,
        "chunk_frames": chunk_frames,
        "chunk_samples": sep.chunk_samples,
        "latency_samples": sep.latency_samples,
        "sample_rate": sep.ap.sample_rate,
        "state_fields": [
            {"shape": list(x.shape), "dtype": str(x.dtype)} for x in state_leaves
        ],
        "calling_convention": "(*state, samples, emb) -> (*state, out)",
    }
    return bytes(exp.serialize()), manifest


def load_exported(data: bytes):
    """Deserialize an artifact into a callable (jit-compiled on use)."""
    exp = jexport.deserialize(
        data if isinstance(data, (bytes, bytearray)) else bytes(data)
    )
    return jax.jit(exp.call)


def save_artifact(path: str, data: bytes, manifest: Optional[dict] = None) -> None:
    with open(path, "wb") as f:
        f.write(data)
    if manifest is not None:
        with open(path + ".json", "w") as f:
            json.dump(manifest, f, indent=2)


def load_artifact(path: str):
    with open(path, "rb") as f:
        return load_exported(f.read())
