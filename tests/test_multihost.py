"""Multi-host (2-process) distributed BA test on CPU devices.

SURVEY.md §4's recipe: pod-scale code paths must run in CI without TPUs —
two OS processes, each with 4 virtual CPU devices, joined by
jax.distributed + gloo collectives into one 8-device mesh. The point-sharded
Schur BA then spans both processes; its psums cross the process boundary
(the DCN stand-in). Results must match the single-process 8-device solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    out = str(tmp / "result.npz")
    port = _free_port()
    env = dict(os.environ)
    # pure-CPU workers: drop the axon sitecustomize path (it registers the
    # TPU PJRT plugin at interpreter start, which initializes the backend
    # before jax.distributed.initialize can run) and the 8-device flag the
    # parent test env forces; each worker asks for 4 devices itself
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), "2", str(port), "4", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return out, logs


def test_two_process_ba_runs(two_process_result):
    out, logs = two_process_result
    assert "proc 0 ok" in logs[0] + logs[1]
    assert "proc 1 ok" in logs[0] + logs[1]
    assert os.path.exists(out)


def test_two_process_matches_single_process(two_process_result):
    """Cross-process point-sharded BA == single-process solve (up to f32
    reduction order)."""
    from sdvl_tpu.dist import multihost
    from sdvl_tpu.solvers import ba

    out, _ = two_process_result
    z = np.load(out)

    problem = multihost.demo_ba_problem()
    huber = float(np.sqrt(5.991) / 420.0)
    res_single = ba.solve(problem, huber=huber)

    np.testing.assert_allclose(
        z["poses"], np.asarray(res_single.poses), atol=5e-4
    )
    assert abs(float(z["chi2"]) - float(res_single.chi2)) < 1e-3 * max(
        float(res_single.chi2), 1.0
    )

    # the two processes' point shards tile the full solution
    pts = {}
    for pid in range(2):
        shards = np.load(out + f".pts{pid}.npz")
        for start, arr in shards.items():
            pts[int(start)] = arr
    full = np.concatenate([pts[k] for k in sorted(pts)], axis=0)
    assert full.shape == res_single.points.shape
    np.testing.assert_allclose(
        full, np.asarray(res_single.points), atol=5e-3
    )
