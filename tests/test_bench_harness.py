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


def test_bench_emits_json_even_when_harness_breaks(tmp_path):
    """End-to-end: point bench at a nonexistent SF dir — every query
    fails, but stdout's last line must still parse as the contract JSON
    with per-query errors recorded.

    SPARK_GRAFT_BENCH_OUT is MANDATORY here: without it this subprocess
    writes its all-errors BENCH_full.json into the repo root, silently
    replacing the committed real-run artifact whenever pytest runs before
    a commit (this actually shipped garbage in r5/r6)."""
    proc = subprocess.run(
        [sys.executable, str(Path(bench.__file__).resolve())],
        env={
            "SPARK_GRAFT_SF_DIR": "/nonexistent/sf0",
            "SPARK_GRAFT_SCALE10": "0",
            "SPARK_GRAFT_BENCH_OUT": str(tmp_path),
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
    # Driver tail capture keeps ~2 KB — the LAST stdout line must fit even
    # in the everything-failed case (r4's BENCH artifact was parsed:null
    # because the single output line outgrew the capture window).
    assert len(line) <= 2000, f"compact line too long: {len(line)} bytes"
    assert doc["n_errors"] == len(json.loads(
        (tmp_path / "BENCH_full.json").read_text()
    )["errors"])


def test_emit_compact_line_stays_small(tmp_path, capsys):
    """68 failing queries with 500-char messages must still produce a
    <2 KB stdout line; the full texts land in BENCH_full.json."""
    result = {
        "metric": "headline_queries_total_sec",
        "value": None,
        "unit": "sec",
        "sf": 0.1,
        "queries": {},
        "errors": {f"q{i:03d}": "X" * 500 for i in range(68)},
    }
    bench._emit(result, out_dir=str(tmp_path))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 2000
    doc = json.loads(line)
    assert doc["n_errors"] == 68
    full = json.loads((tmp_path / "BENCH_full.json").read_text())
    assert len(full["errors"]) == 68 and len(full["errors"]["q000"]) == 500
