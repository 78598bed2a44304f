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
