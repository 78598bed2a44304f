"""Worker for the two-process preemption-agreement test.

Same fake-cluster shape as `multihost_worker.py` (2 processes x 4 CPU
devices via gloo), but runs the full `Trainer.fit` loop — and ONLY
process 0 requests preemption.  Process 1's local flag stays False the
whole run; the only way it can stop at the same step is the
`Trainer._preempt_agreed` allgather at check_interval boundaries.
Remove that collective and process 1 trains to max_steps: the parent
test fails on the step/preempted mismatch.

Usage: python multihost_preempt_worker.py <process_id> <port> <data_dir> <log_dir>
Prints: "PREEMPT <pid> step=<n> preempted=<0|1>" on success.
"""

import sys

pid = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]
log_dir = sys.argv[4]

import jax

jax.config.update("jax_platforms", "cpu")

from voicesplit_tpu.parallel import initialize_distributed

initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

from voicesplit_tpu.config import Config
from voicesplit_tpu.train.trainer import Trainer

SR = 16000

c = Config()
c.model_name = "voicefilter"
c.loss.loss_name = "power_law_compression"
c.audio.audio_len = 0.4
c.model.lstm_dim = 16
c.model.fc1_dim = 24
c.model.conv_channels = 4
c.model.conv_out_channels = 2
c.train_config.batch_size = 4  # per-host; global 8 over the 8-dev data axis
c.train_config.compute_dtype = "float32"
c.train_config.summary_interval = 100
c.train_config.check_interval = 2  # agreement boundary under test
c.train_config.checkpoint_interval = 1000  # only the preemption saves
c.train_config.epochs = 10000
c.train_config.logs_path = log_dir
c.dataset.train_dir = data_dir
c.dataset.test_dir = data_dir

tr = Trainer(c, log_dir=log_dir, enable_tb=False, prefetch_depth=0,
             async_checkpoint=False)
if pid == 0:
    # before fit(): flag is local to THIS process; process 1 never sees
    # a signal and can only stop via the allgather agreement
    tr.request_preemption()

res = tr.fit(max_steps=20, validate_at_epoch_start=False)
print(f"PREEMPT {pid} step={res.get('step')} "
      f"preempted={1 if res.get('preempted') else 0}", flush=True)
