"""Worker for the two-process multi-host test (run by test_multihost.py).

Each process is one fake "host" with 4 CPU devices
(`xla_force_host_platform_device_count=4`, set in the parent's spawn
env — it must be in the process environment before Python starts
because the PJRT plugin is loaded at interpreter startup).  The two
processes form one 8-device cluster via `jax.distributed` + gloo and run
ONE full sharded train step: batch data-parallel ACROSS processes,
wide-variant weights model-parallel WITHIN each process.

Usage: python multihost_worker.py <process_id> <port> [model_axis]
Prints: "RESULT <pid> loss=<loss:.10f>" on success.
"""

import sys

pid = int(sys.argv[1])
port = sys.argv[2]
model_axis = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import jax

jax.config.update("jax_platforms", "cpu")

from voicesplit_tpu.parallel import (
    initialize_distributed,
    make_mesh,
    put_batch,
    shard_train_state,
)

initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import numpy as np

from voicesplit_tpu.config import Config
from voicesplit_tpu.dsp.processor import AudioProcessor
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.train import create_train_state, make_optimizer, make_train_step

SR = 16000

c = Config()
c.model_name = "voicesplit"
c.loss.loss_name = "si_snr"
c.audio.audio_len = 0.4
c.model.lstm_dim = 64
c.model.fc1_dim = 48
c.model.conv_channels = 8
c.model.conv_out_channels = 2
c.train_config.compute_dtype = "float32"
B_local = 2  # per-host; global batch = 4
c.train_config.batch_size = B_local

ap = AudioProcessor(c.audio)
model = make_masknet(c)
tx = make_optimizer(c)
L = int(SR * c.audio.audio_len)
T = ap.frames_for(L)
B_global = B_local * jax.process_count()

# identical seed on both hosts ⇒ identical initial params
state = create_train_state(c, model, jax.random.PRNGKey(0), (B_global, T, 601), tx)

mesh = make_mesh(data=8 // model_axis, model=model_axis)
state = shard_train_state(state, mesh, model_parallel=model_axis > 1)

# per-host shard of a deterministic GLOBAL batch: host h takes rows
# [h*B_local, (h+1)*B_local) so the result is host-count invariant
rng = np.random.default_rng(1234)
gbatch = {
    "emb": rng.standard_normal((B_global, 256)).astype(np.float32),
    "target_wav": (0.1 * rng.standard_normal((B_global, L))).astype(np.float32),
    "mixed_wav": (0.2 * rng.standard_normal((B_global, L))).astype(np.float32),
    "wav_len": np.full((B_global,), L, np.int32),
    "seq_len": np.full((B_global,), T, np.int32),
}
local = {k: v[pid * B_local : (pid + 1) * B_local] for k, v in gbatch.items()}
batch = put_batch(mesh, local)
assert batch["mixed_wav"].shape == (B_global, L), batch["mixed_wav"].shape

step = make_train_step(c, model, ap, tx, donate=False)
new_state, metrics = step(state, batch)
loss = float(jax.device_get(metrics)["loss"])
assert np.isfinite(loss), loss
assert int(jax.device_get(new_state.step)) == 1

# Checkpoint/eval path: EVERY process gathers a host-local copy of the
# sharded state (collective — this is what Trainer._host_copy does so
# that process-0-gated checkpointing/eval cannot deadlock the others).
from jax.experimental import multihost_utils

host_state = multihost_utils.process_allgather(new_state, tiled=True)
leaves = jax.tree_util.tree_leaves(host_state.params)
ref_leaves = jax.tree_util.tree_leaves(new_state.params)
assert all(h.shape == r.shape for h, r in zip(leaves, ref_leaves))
assert all(np.isfinite(x).all() for x in leaves)
print(f"RESULT {pid} loss={loss:.10f}", flush=True)
