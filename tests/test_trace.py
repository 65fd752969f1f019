"""Tracer unit tests + CLI integration smoke (tracing/snapshot flags)."""

import json
import os
import subprocess
import sys
import time

from sdvl_tpu.utils.trace import Tracer

_CLI_ENV = {**os.environ, "SDVL_PLATFORM": "cpu"}


def test_spans_aggregate():
    tr = Tracer()
    for _ in range(5):
        with tr.span("a"):
            time.sleep(0.001)
    with tr.span("a"):
        with tr.span("b"):
            pass
    s = tr.summary()
    assert s["a"]["n"] == 6
    assert s["a.b"]["n"] == 1
    assert s["a"]["mean_ms"] >= 0.5
    assert "p95_ms" in s["a"] and "max_ms" in s["a"]


def test_disabled_tracer_is_noop():
    tr = Tracer(enabled=False)
    with tr.span("x"):
        pass
    assert tr.summary() == {}


def test_report_and_json(tmp_path):
    tr = Tracer()
    with tr.span("stage"):
        pass
    txt = tr.report()
    assert "stage" in txt
    p = tmp_path / "t.json"
    tr.write_json(str(p))
    assert json.loads(p.read_text())["stage"]["n"] == 1


def test_cli_trace_snapshot_resume(tmp_path):
    """Full CLI round trip: synthetic run with --trace/--snapshot, then
    --resume continues from the checkpoint."""
    trace = tmp_path / "trace.json"
    snap = tmp_path / "s.npz"
    out = subprocess.run(
        [sys.executable, "-m", "sdvl_tpu.cli.run", "--synthetic", "14",
         "--quiet", "--trace", str(trace), "--snapshot", str(snap)],
        capture_output=True, text=True, timeout=900, check=True,
        env=_CLI_ENV,
    )
    assert trace.exists() and snap.exists(), out.stdout + out.stderr
    tj = json.loads(trace.read_text())
    assert "preprocess" in tj and "track" in tj
    out2 = subprocess.run(
        [sys.executable, "-m", "sdvl_tpu.cli.run", "--synthetic", "6",
         "--quiet", "--resume", str(snap)],
        capture_output=True, text=True, timeout=900, check=True,
        env=_CLI_ENV,
    )
    assert "resumed from" in out2.stdout
