"""Simulated multi-host test: 2 local processes over jax.distributed.

The reference is single-device (SURVEY.md section 2.3); the framework's
host axis (``parallel/distributed.py``) had never executed with more than
one process before this test.  Two local CPU processes x 4 virtual devices
form a (host=2, view=4) mesh with DCN = localhost; each worker checks its
addressable shards of the view-sharded pipeline output against an
unsharded local reference run (see ``multihost_worker.py``).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_pipeline():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # fresh processes: drop the parent's 8-device flag so the worker's
    # 4-device setting wins, and force CPU before any backend init
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, addr, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_WORKER_OK pid={pid}" in out, out[-4000:]
