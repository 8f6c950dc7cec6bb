"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only state is the high-water-mark scalar (SURVEY §2.4);
these are the managed-keyed-state operators a continuous training-data
pipeline needs on top: cross-batch exact dedup and per-key running
counters. State lives in the state store (checkpointed, partitioned by
key) — restarts resume from the checkpoint, and state size is bounded
by distinct keys, not stream length.

At scale: the grouping shuffles on the state key once per micro-batch;
rows flow through Arrow into Python per key-group. Keep the key space
partition-friendly (fingerprints hash-distribute evenly by
construction).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    grouped_stream: DataFrame,
    output_schema: T.StructType,
) -> DataFrame:
    """First-seen-wins dedup across micro-batches.

    Input must already be grouped by the dedup key
    (``df.groupBy("fingerprint")``). Emits each group's first-ever row
    (by arrival); every later row with the same key — in the same batch
    or any later one — is dropped. State per key: a single seen flag.

    The batch analog is operators.dedup.exact_dedup; this is its
    infinite-stream form (state store instead of a groupBy pass).
    """

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) > 0:
                first = pdf.iloc[:1]
                break
        if first is None:
            return
        state.update((True,))
        yield first

    return grouped_stream.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_counts(grouped_stream: DataFrame, key_name: str) -> DataFrame:
    """Per-key running totals across the whole stream: emits one row per
    key per micro-batch with the cumulative count so far (the stateful
    form of a groupBy().count() that never forgets)."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        new = sum(len(p) for p in pdfs)
        if new == 0:
            return
        total += new
        state.update((total,))
        yield pd.DataFrame({key_name: [key[0]], "total": [total]})

    out_schema = T.StructType(
        [
            T.StructField(key_name, T.StringType()),
            T.StructField("total", T.LongType()),
        ]
    )
    return grouped_stream.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="total long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
