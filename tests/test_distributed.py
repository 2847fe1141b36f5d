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


def _run_two_process(tmp_path, scenario):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), str(tmp_path),
             scenario],
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
    # both processes observed the same result
    a = (tmp_path / "ok_0").read_text()
    assert a == (tmp_path / "ok_1").read_text()
    (tmp_path / "ok_0").unlink()
    (tmp_path / "ok_1").unlink()
    return a


def test_two_process_dcn_learn(tmp_path):
    _run_two_process(tmp_path, "dense")


def test_two_process_dcn_sparse_ring(tmp_path):
    """Sparse gather-ring learn across the DCN cut: each chip holds only
    its ELL+COO shard and the shards walk the 8-device / 2-process ring."""
    _run_two_process(tmp_path, "sparse")


def test_two_process_dcn_predict(tmp_path):
    """Distributed predict: SV shards on both processes, psummed decision
    values replicated everywhere."""
    _run_two_process(tmp_path, "predict")


def test_two_process_dcn_checkpoint_resume(tmp_path):
    """Checkpoint save -> process death -> resume in a FRESH 2-process
    launch (the elastic-recovery envelope the reference never had)."""
    saved = _run_two_process(tmp_path, "ckpt_a")
    assert "saved at k=6" in saved
    assert (tmp_path / "dcn_cg.npz").exists()
    resumed = _run_two_process(tmp_path, "ckpt_b")
    assert "resumed to k=" in resumed
