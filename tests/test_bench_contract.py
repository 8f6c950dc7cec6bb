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
    assert set(d) == {"metric", "value", "unit", "queries",
                      "queries_truncated", "n_queries", "sf", "artifact"}
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert set(d["queries"]) == {"q_count_min_max"}
    assert d["n_queries"] == 1 and d["queries_truncated"] is False
    assert d["value"] > 0
    # driver tail capture is 2000 chars: the stdout line must stay small
    assert len(lines[0]) < 1900


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
    assert set(d) == {"metric", "value", "unit", "queries",
                      "queries_truncated", "n_queries", "sf", "artifact"}


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


def test_flag_outliers_and_self_verify():
    """VERDICT r7 item 1: a synthetic outlier (vs the previous artifact
    OR vs the sweep's own repeat spread) must fire the flag +
    fresh-subprocess re-measure path and substitute the isolated
    number, marked contaminated_in_sweep."""
    import bench

    timings = {"q_fast": 1.0, "q_cross_run": 40.0, "q_intra_run": 20.0,
               "q_tiny": 0.3, "q_slow_first_run": 2.0}
    dispersion = {
        "q_fast": {"runs": [1.1, 1.0, 1.0]},
        "q_cross_run": {"runs": [41.0, 40.0, 39.0]},   # stable but 10x prev
        "q_intra_run": {"runs": [45.0, 1.6, 20.0]},    # r7's 28x spread
        "q_tiny": {"runs": [0.9, 0.1, 0.3]},           # big ratio, sub-2s
        # run 1 pays plan codegen by design: steady-state runs agree ->
        # NOT contamination (measured: 10/11 first-sweep flags were
        # this shape and re-measured to the same numbers)
        "q_slow_first_run": {"runs": [14.0, 2.1, 1.9]},
    }
    prev = {"q_fast": 1.0, "q_cross_run": 4.0, "q_intra_run": 18.0,
            "q_tiny": 0.1, "q_slow_first_run": 2.0}
    flagged = bench.flag_outliers(timings, dispersion, prev)
    assert set(flagged) == {"q_cross_run", "q_intra_run"}

    calls = []

    def fake_measure(name, repeat=3):
        calls.append(name)
        return {"query": name, "runs": [5.0, 3.0, 3.2], "scalar": 3.1}

    subbed = bench.self_verify(timings, dispersion, prev,
                               measure=fake_measure)
    assert set(subbed) == set(calls) == {"q_cross_run", "q_intra_run"}
    for n in subbed:
        assert timings[n] == 3.1
        assert dispersion[n]["contaminated_in_sweep"] is True
        assert dispersion[n]["in_sweep"] in (40.0, 20.0)
        assert dispersion[n]["isolated_runs"] == [5.0, 3.0, 3.2]
    assert timings["q_fast"] == 1.0  # untouched


def test_self_verify_keeps_in_sweep_on_measure_failure():
    import bench

    timings = {"q_x": 40.0}
    dispersion = {"q_x": {"runs": [40.0, 40.0]}}
    subbed = bench.self_verify(timings, dispersion, {"q_x": 4.0},
                               measure=lambda n, repeat=3: None)
    assert subbed == []
    assert timings["q_x"] == 40.0
    assert "contaminated_in_sweep" not in dispersion["q_x"]


def test_bench_isolated_child_mode():
    """--isolated runs ONE query in a fresh session and prints a JSON
    line isolated_measure can parse."""
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "4",
        "SPARK_GRAFT_BENCH_OUT": "",
    }
    out = subprocess.run(
        [sys.executable, "bench.py", "--isolated", "q_count_min_max",
         "--repeat", "2"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    d = json.loads([l for l in out.stdout.splitlines() if l.strip()][-1])
    assert d["query"] == "q_count_min_max"
    assert len(d["runs"]) == 2 and d["scalar"] > 0


def test_self_verify_caps_remeasure_count():
    """A badly contaminated box could flag dozens of queries; the
    re-measure pass is bounded at _MAX_REMEASURE, worst-first, with
    the remainder marked flagged_not_remeasured."""
    import bench

    n = bench._MAX_REMEASURE + 5
    timings = {f"q{i}": 10.0 + i for i in range(n)}
    dispersion = {f"q{i}": {"runs": [10.0 + i] * 3} for i in range(n)}
    prev = {f"q{i}": 1.0 for i in range(n)}     # every query 10x+ prev

    calls = []

    def fake_measure(name, repeat=3):
        calls.append(name)
        return {"query": name, "runs": [2.0, 2.0, 2.0], "scalar": 2.0}

    subbed = bench.self_verify(timings, dispersion, prev,
                               measure=fake_measure)
    assert len(subbed) == len(calls) == bench._MAX_REMEASURE
    # worst offenders (highest ratio = highest index) re-measured first
    assert f"q{n-1}" in subbed and "q0" not in subbed
    leftovers = [q for q in timings if q not in subbed]
    assert all(dispersion[q].get("flagged_not_remeasured") for q in leftovers)
    assert all(timings[q] >= 10.0 for q in leftovers)  # numbers kept
