"""High-version-count ladder for the manifest CDC stream source
(VERDICT r6 item 7): drive one table through N commits and measure

- per-microbatch PLANNING cost for the newest single version (the
  steady-state tail operation) at increasing history depths — the
  design claim is O(changed files), flat in the number of historical
  versions, because _diff_one loads only the two adjacent manifests'
  non-shared segments;
- full-history replay planning (all N versions) for reference;
- the Spark streaming offset-log footprint after draining the history
  (bounded by Spark's own minBatchesToRetain compaction, not by N).

Usage: python scripts/scale_stream_source.py [n_commits ...]
Prints one JSON line; evidence for SCALE_MANIFEST_r7 / SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from forklift_spark.datasource import (  # noqa: E402
    ManifestDataSource,
    _ManifestStreamReader,
)
from forklift_spark.manifest import ManifestTable  # noqa: E402
from forklift_spark.session import get_spark  # noqa: E402


def _build(spark, root: str, n_commits: int) -> ManifestTable:
    t = ManifestTable(spark, root, "ev")
    t.create(
        spark.range(4000).select(
            F.col("id").alias("k"),
            (F.col("id") % 8).cast("int").alias("p"),
            (F.col("id") * 10).alias("v"),
        ),
        partition_by="p",
    )
    for i in range(n_commits - 1):
        t.merge(
            spark.createDataFrame(
                [(int(i % 4000), int(i % 8), int(i))],
                "k long, p int, v long",
            ),
            on="k", use_dv=(i % 2 == 0),
        )
    return t


def _plan_one(reader, v: int) -> float:
    t0 = time.perf_counter()
    reader.partitions({"version": v - 1}, {"version": v})
    return time.perf_counter() - t0


def run(spark, n_commits: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"fk_stream_ladder_{n_commits}_")
    t = _build(spark, root, n_commits)
    head = t.current_version()
    opts = {"path": root, "table": "ev", "cdc": "true"}
    schema_json = t.schema().json()
    reader = _ManifestStreamReader(
        {**opts, "starting_version": "0"}, schema_json)

    # steady-state tail: plan ONLY the newest version, median of 5
    tail = sorted(_plan_one(reader, head) for _ in range(5))[2]
    # full replay: plan every version in one range
    t0 = time.perf_counter()
    parts = reader.partitions({"version": 0}, {"version": head})
    replay = time.perf_counter() - t0

    # offset-log footprint after a real drain through the engine
    spark.dataSource.register(ManifestDataSource)
    ckpt = os.path.join(root, "_ckpt")
    stream = (spark.readStream.format("forklift_manifest")
              .option("table", "ev").option("cdc", "true")
              .option("starting_version", "0").load(root))
    q = (stream.writeStream.format("noop")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    q.stop()
    offsets_dir = os.path.join(ckpt, "offsets")
    offset_files = len(os.listdir(offsets_dir))
    offset_bytes = sum(
        os.path.getsize(os.path.join(offsets_dir, f))
        for f in os.listdir(offsets_dir))
    return {
        "n_commits": n_commits,
        "head_version": head,
        "tail_plan_one_version_sec": round(tail, 4),
        "replay_plan_all_sec": round(replay, 4),
        "replay_parts": len(parts),
        "offset_log_files": offset_files,
        "offset_log_bytes": offset_bytes,
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10, 60, 240]
    spark = get_spark(app_name="fk_stream_ladder")
    print(json.dumps({"runs": [run(spark, n) for n in ns]}))


if __name__ == "__main__":
    main()
