"""Two-process `jax.distributed` test: the multihost code paths
(process-sharded batch assembly, evaluate's process_allgather AVG
reduction over sorted keys, host-sharded loaders) must reproduce the
single-process numbers exactly.

VERDICT r2 weak-spot #3: these branches had never executed. Spawns real
OS processes (localhost rendezvous, 4 virtual CPU devices each) — the same
topology as a 2-host pod slice, minus the ICI.

Reference semantics matched: common.py:69-102 (gather_all + AVG
reduce_dict with sorted keys), multishapenet.py:110-138 (even host
sharding).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(nproc: int, tmp_path) -> dict:
    port = _free_port()
    out = str(tmp_path / f"result_{nproc}.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(p), str(nproc), str(port), out],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for p in range(nproc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_matches_single(tmp_path):
    single = _run(1, tmp_path)
    double = _run(2, tmp_path)
    assert double["process_count"] == 2 and double["device_count"] == 8
    assert single["process_count"] == 1

    assert single["device_assembly_ok"] and double["device_assembly_ok"]
    np.testing.assert_allclose(double["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(double["grad_norm"], single["grad_norm"], rtol=1e-4)
    for k, v in single["eval"].items():
        np.testing.assert_allclose(
            double["eval"][k], v, rtol=1e-5, err_msg=f"eval metric {k}"
        )
