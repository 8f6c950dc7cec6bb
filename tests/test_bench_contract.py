"""bench.py driver contract: exactly ONE JSON line on stdout with the
required keys — the per-round BENCH_r{N}.json depends on this shape.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_QUERIES": "q_count_min_max",
        "SPARK_GRAFT_CPUS": "4",
    }
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert set(d) == {"metric", "value", "unit", "queries", "sf"}
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert set(d["queries"]) == {"q_count_min_max"}
    assert d["value"] > 0


def test_bench_unknown_queries_filtered():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_QUERIES": "no_such_query",
        "SPARK_GRAFT_CPUS": "4",
    }
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    d = json.loads([l for l in out.stdout.splitlines() if l.strip()][0])
    assert d["queries"] == {}
