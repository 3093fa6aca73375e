"""Two-process jax.distributed smoke (VERDICT r4 #6).

Launches hrpe_tpu/parallel/multihost_smoke.py twice (2 virtual CPU
devices per process) against a local coordinator and asserts both
processes complete the init + sharded-batch + global-reduce +
process_allgather sequence — the fake-backend multi-host test the
reference's DDP path never had (SURVEY.md §4)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "hrpe_tpu.parallel.multihost_smoke",
             str(pid), "2", str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} rc={p.returncode}\n{out[-2000:]}"
        assert f"MULTIHOST_OK pid={pid}/2 devices=4" in out, out[-2000:]
