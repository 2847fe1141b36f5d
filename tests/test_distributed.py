"""Multi-host (DCN) path test: 2 spawned processes x 4 virtual CPU devices
run one global 8-shard learn through ``jax.distributed`` —
the envelope the reference never had (its "Multi-GPU" CI is single-node,
``.jenkins/Jenkinsfile-Tests-Multi-GPU:130-133``; no NCCL/MPI anywhere).
Exercises ``parallel/distributed.py`` end-to-end: initialize_distributed +
make_global_row_sharded + the same make_sharded_learn as single-process.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_learn(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outputs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outputs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i]}"
        assert (tmp_path / f"ok_{i}").exists(), outputs[i]
    # both processes observed the same converged solve
    assert (tmp_path / "ok_0").read_text() == (tmp_path / "ok_1").read_text()
