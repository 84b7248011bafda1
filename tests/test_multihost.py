"""Real 2-process multi-host test: jax.distributed over localhost.

Spawns two worker processes (tests/multihost_worker.py), each with 2
virtual CPU devices; they form one 4-device global mesh via
parallel.multihost, run the point-sharded distributed BA with psum
collectives crossing the process boundary, and check the result against
the single-process solver. This is the DCN story of SURVEY.md §2g executed
for real (the reference has no network layer at all).
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e

HERE = os.path.dirname(__file__)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ba(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "result.txt")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             coord, str(pid), "2", out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        outs.append(o.decode(errors="replace"))
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o[-3000:]}"
    assert os.path.exists(out), outs[0][-2000:]
    dq, dt = map(float, open(out).read().split())
    assert dq < 5e-3 and dt < 5e-3, (dq, dt)
