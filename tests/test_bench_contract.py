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


def test_bench_repeat_mode_stdout_unchanged():
    """--repeat 3 keeps the one-line stdout contract (dispersion lives
    only in the artifact, which subset runs never write)."""
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_QUERIES": "q_count_min_max",
        "SPARK_GRAFT_CPUS": "4",
    }
    out = subprocess.run(
        [sys.executable, "bench.py", "--repeat", "3"],
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


def test_artifact_drift_guard(tmp_path):
    """write_artifact refuses a refresh whose common-query median drifts
    >1.2x, parks it beside the artifact, and honors force=True."""
    import bench

    art_path = str(tmp_path / "BENCH_LOCAL_test.json")
    base = {
        "metric": "headline_queries_total", "unit": "sec", "sf": 0.1,
        "queries": {f"q{i}": 1.0 for i in range(12)},
        "value": 12.0, "repeat": 3,
        "dispersion": {f"q{i}": {"min": 0.9, "med": 1.0, "max": 1.1,
                                 "runs": [1.1, 1.0, 0.9]} for i in range(12)},
    }
    assert bench.write_artifact(art_path, base)  # first write always lands

    drifted = dict(base, queries={f"q{i}": 1.5 for i in range(12)}, value=18.0)
    assert not bench.write_artifact(art_path, drifted)
    assert json.load(open(art_path))["value"] == 12.0  # old artifact kept
    parked = json.load(open(art_path + ".drift-rejected.json"))
    assert parked["value"] == 18.0  # numbers preserved, not lost

    ok = dict(base, queries={f"q{i}": 1.1 for i in range(12)}, value=13.2)
    assert bench.write_artifact(art_path, ok)  # 1.1x is within band
    assert json.load(open(art_path))["value"] == 13.2

    assert bench.write_artifact(art_path, drifted, force=True)
    assert json.load(open(art_path))["value"] == 18.0
