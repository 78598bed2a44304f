"""Real two-process multi-host training test.

The reference is single-GPU (`run_train.sh:1`, SURVEY.md §2.9); the
TPU framework introduces multi-host DP+TP.  This test spawns TWO
separate Python processes, each a fake 4-device host, clustered with
`jax.distributed` over gloo — the closest a single machine gets to a
real multi-host TPU pod — and checks that one full sharded train step
runs and both hosts agree on the (global, psum-reduced) loss.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, port: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=_REPO,
    )


def test_two_process_train_step_agrees():
    port = _free_port()
    procs = [_spawn(0, port), _spawn(1, port)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        m = re.search(r"RESULT \d loss=(-?\d+\.\d+)", out)
        assert m, out[-4000:]
        losses.append(float(m.group(1)))
    assert np.isfinite(losses).all()
    # both hosts see the same global loss (it rode a cross-process psum)
    assert losses[0] == pytest.approx(losses[1], rel=1e-6), losses


_PREEMPT_WORKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "multihost_preempt_worker.py"
)


def test_two_process_preemption_agreement(tmp_path):
    """One host preempted ⇒ BOTH checkpoint at the same step.

    Only process 0 calls `request_preemption()`; process 1 can only stop
    via the `_preempt_agreed` allgather at check_interval boundaries
    (`trainer.py`).  Remove that collective and process 1 runs to
    max_steps=20 — this test then fails on step/preempted mismatch.
    """
    from voicesplit_tpu.data import build_synthetic_dataset
    from voicesplit_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    data_dir = str(tmp_path / "data")
    log_dir = str(tmp_path / "logs")
    build_synthetic_dataset(data_dir, 8, 16000, 0.4, seed=0)

    port = _free_port()

    def spawn(pid):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.Popen(
            [sys.executable, _PREEMPT_WORKER, str(pid), str(port), data_dir, log_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_REPO,
        )

    procs = [spawn(0), spawn(1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    steps, preempted = [], []
    for out in outs:
        m = re.search(r"PREEMPT \d step=(\d+) preempted=(\d)", out)
        assert m, out[-4000:]
        steps.append(int(m.group(1)))
        preempted.append(bool(int(m.group(2))))
    # both exited the preemption path, at the SAME agreed step — the
    # first check_interval=2 boundary, well before max_steps=20
    assert preempted == [True, True], (preempted, steps)
    assert steps[0] == steps[1] == 2, steps
    # process 0 wrote the checkpoint at the agreed step
    ckpt = latest_checkpoint(log_dir)
    assert ckpt is not None
    assert int(load_checkpoint(ckpt)["step"]) == 2
