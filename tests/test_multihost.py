"""Real 2-process multi-host bootstrap test (r4 VERDICT missing #3/task 6).

Spawns two local CPU worker processes with a localhost coordinator and runs
``tests/_multihost_worker.py`` in each: ``initialize_multihost`` takes its
non-no-op branch (``jax.distributed.initialize``), the workers build a
4-device cross-process "dp" mesh, assemble a globally-sharded batch from
host-local halves (``process_local_batch``), and run a sharded batched
boxADMM solve checked against a replicated oracle.

Opt-in: heavyweight (two fresh JAX processes + a coordination service), so
it only runs with POLYMPC_MULTIHOST_TESTS=1; normal CI stays single-process.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("POLYMPC_MULTIHOST_TESTS") != "1",
    reason="set POLYMPC_MULTIHOST_TESTS=1 to run the 2-process bootstrap")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_bootstrap():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            POLYMPC_COORDINATOR=f"127.0.0.1:{port}",
            POLYMPC_NUM_PROCESSES="2",
            POLYMPC_PROCESS_ID=str(pid),
            PYTHONPATH=_REPO + os.pathsep + env_base.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"worker {pid} missing OK:\n{out}"
        assert "processes=2" in out and "devices=4" in out, out
