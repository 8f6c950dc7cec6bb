"""Structured Streaming surface (SURVEY.md §2.4).

The reference is strictly batch; its pull-loop reads and HWM sync are
the micro-batch/watermark semantics Spark formalizes. This package
provides the streaming-ready equivalents:

- stream_incremental_sync: readStream -> foreachBatch upsert — the
  continuous version of patterns.incremental_pipe (late rows below the
  watermark are dropped, exactly the reference's `matcher > hwm`).
- windowed_counts / sessionized: watermarked event-time aggregations
  reusing the same expressions as the batch queries in
  queries/timeseries.py.
- streaming_dedup / streaming_running_counts: custom keyed-state
  operators via applyInPandasWithState (stateful.py).
"""

from forklift_spark.streaming.jobs import (
    sessionized,
    stream_incremental_sync,
    windowed_counts,
)
from forklift_spark.streaming.stateful import (
    streaming_dedup,
    streaming_running_counts,
)

__all__ = [
    "stream_incremental_sync",
    "windowed_counts",
    "sessionized",
    "streaming_dedup",
    "streaming_running_counts",
]
