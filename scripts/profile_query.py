"""Measure one catalog query in a fresh session: wall time (warmup at
sf0.001 + N timed runs at $SPARK_GRAFT_SF_DIR) AND the number of Spark
jobs the query launches (orchestration-heavy queries — manifest commits,
streaming drains — are job-count bound at bench scale, so job count is
the before/after evidence for commit-path optimizations).

Usage: python scripts/profile_query.py <query> [runs]
Prints one JSON line: {"query": ..., "runs": [...], "jobs": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from forklift_spark import queries as Q
    from forklift_spark.session import get_spark

    spark = get_spark(app_name=f"profile_{name}")
    cat = Q.catalog()
    fn = cat[name]
    try:
        fn(spark, WARMUP_DIR).count()
    except Exception:
        pass
    sc = spark.sparkContext
    runs, jobs = [], None
    for i in range(n_runs):
        group = f"profile_{name}_{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        runs.append(round(time.perf_counter() - t0, 4))
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(None, None)
    print(json.dumps({"query": name, "runs": runs, "jobs_last_run": jobs}))


if __name__ == "__main__":
    main()
