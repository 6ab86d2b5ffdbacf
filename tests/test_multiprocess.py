"""TRUE multi-process distributed tests (SURVEY.md section 4(c), section 5).

The 8-virtual-device suite validates *sharding*; these validate the code
paths that only exist across processes: ``jax.distributed`` bootstrap, the
``make_array_from_process_local_data`` global-batch assembly in
``shard_batch``, per-host loader slicing with ``num_hosts=2``, and
cross-process collectives — by actually spawning two local JAX processes
with a coordinator.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # no axon plugin: pure local CPU processes
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    nprocs = 2
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), str(nprocs), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    # Every process must hold identical replicated results: same losses
    # (gradient all-reduce agreed), same PCKh counts (global batch), same
    # params (no silent divergence into independent single-process runs).
    a, b = outs
    assert a["process"] != b["process"]
    assert a["num_steps_per_epoch"] == b["num_steps_per_epoch"]
    np.testing.assert_allclose(a["losses"], b["losses"], rtol=0, atol=0)
    np.testing.assert_allclose(a["pckh_total"], b["pckh_total"])
    np.testing.assert_allclose(a["param_checksum"], b["param_checksum"],
                               rtol=0, atol=0)
    # PCKh totals count the GLOBAL batch (8 samples x visible joints), not a
    # single host's local half.
    assert sum(a["pckh_total"]) > 8
    # steps_per_dispatch=2 scan path agrees across processes too.
    assert len(a["multi_losses"]) >= 4
    np.testing.assert_allclose(a["multi_losses"], b["multi_losses"],
                               rtol=0, atol=0)
    # Dataset-ordered predict() is replicated: both processes hold the same
    # full prediction array (33 rows incl. the padded odd tail).
    np.testing.assert_allclose(a["preds_checksum"], b["preds_checksum"])
    np.testing.assert_allclose(a["preds_row0"], b["preds_row0"])
    np.testing.assert_allclose(a["preds_row32"], b["preds_row32"])


def test_initialize_distributed_raises_with_coordinator_env(monkeypatch):
    # A configured-but-broken multi-host bootstrap must be FATAL, not a
    # silent downgrade to N independent single-process runs.
    import jax

    from dsnt_pose2d_tpu.parallel import mesh as mesh_mod

    def boom():
        raise RuntimeError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(RuntimeError, match="no coordinator"):
        mesh_mod.initialize_distributed()

    # Without the env var the failure stays a silent single-process start.
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    mesh_mod.initialize_distributed()
