"""bench.py fault isolation (VERDICT r3 item 2): one broken query must
never destroy the round's other timings — r3 lost ALL its numbers to a
single AnalysisException because the only print was after every loop."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import bench


def test_run_records_error_and_returns_none():
    errors: dict[str, str] = {}

    def boom(spark, sf_dir):
        raise RuntimeError("deliberate")

    out = bench._run({"q": boom}, "q", None, "/nowhere", 2, errors)
    assert out is None
    assert "RuntimeError" in errors["q"] and "deliberate" in errors["q"]


def test_run_times_good_query():
    errors: dict[str, str] = {}

    class FakeWriter:
        def mode(self, _):
            return self

        def format(self, _):
            return self

        def save(self):
            return None

    class FakeDF:
        write = FakeWriter()

    out = bench._run({"q": lambda s, d: FakeDF()}, "q", None, "/nowhere", 3, errors)
    assert out is not None and len(out) == 3
    assert not errors


def test_bench_emits_json_even_when_harness_breaks():
    """End-to-end: point bench at a nonexistent SF dir — every query
    fails, but stdout's last line must still parse as the contract JSON
    with per-query errors recorded."""
    proc = subprocess.run(
        [sys.executable, str(Path(bench.__file__).resolve())],
        env={
            "SPARK_GRAFT_SF_DIR": "/nonexistent/sf0",
            "SPARK_GRAFT_SCALE10": "0",
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
        },
        capture_output=True,
        text=True,
        timeout=600,
    )
    line = proc.stdout.strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total_sec"
    assert doc["errors"], "expected per-query errors for a missing SF dir"
    assert doc["queries"] == {}
