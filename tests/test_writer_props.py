"""Property-based writer semantics: random write sequences vs a
dict model (hypothesis).

The reference has no property tests (SURVEY §5); this goes beyond its
strategy: any sequence of overwrite/append/upsert batches over evolving
column subsets must leave the table equal to an executable model —
last-writer-wins per pk for upsert, bag semantics for append, schema =
union of seen columns with NULL fill.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from forklift_spark.writer import ParquetTableWriter

COLS = {"a": T.LongType(), "b": T.StringType(), "c": T.DoubleType()}

ids = st.integers(min_value=0, max_value=9)
values = {
    "a": st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    "b": st.one_of(st.none(), st.text(alphabet="xyz", max_size=3)),
    "c": st.one_of(st.none(), st.sampled_from([0.0, 1.5, -2.25])),
}


@st.composite
def batches(draw):
    cols = draw(st.sets(st.sampled_from(sorted(COLS)), min_size=1))
    n = draw(st.integers(min_value=1, max_value=4))
    rows = []
    seen = set()
    for _ in range(n):
        i = draw(ids.filter(lambda x: x not in seen))
        seen.add(i)
        rows.append({"id": i, **{c: draw(values[c]) for c in sorted(cols)}})
    mode = draw(st.sampled_from(["overwrite", "append", "upsert"]))
    return mode, sorted(cols), rows


def _df(spark, cols, rows):
    schema = T.StructType(
        [T.StructField("id", T.LongType(), False)]
        + [T.StructField(c, COLS[c], True) for c in cols]
    )
    return spark.createDataFrame(rows, schema)


def _model_apply(model_rows, all_cols, mode, cols, rows):
    """model_rows: list of dicts; returns (rows, columns-seen)."""
    if mode == "overwrite" or not model_rows:
        return [dict(r) for r in rows], set(cols) | {"id"}
    all_cols = set(all_cols) | set(cols) | {"id"}
    if mode == "append":
        return model_rows + [dict(r) for r in rows], all_cols
    # upsert: replace by id
    batch_ids = {r["id"] for r in rows}
    kept = [r for r in model_rows if r["id"] not in batch_ids]
    return kept + [dict(r) for r in rows], all_cols


def _normalize(rows, all_cols):
    return sorted(
        (tuple((c, r.get(c)) for c in sorted(all_cols)) for r in rows), key=repr
    )


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=st.lists(batches(), min_size=1, max_size=4))
def test_write_sequence_matches_model(spark, tmp_path_factory, seq):
    root = str(tmp_path_factory.mktemp("wh"))
    w = ParquetTableWriter(spark, root)
    model_rows: list[dict] = []
    model_cols: set[str] = set()
    for mode, cols, rows in seq:
        w.write(_df(spark, cols, rows), "t", mode=mode, primary_key="id")
        model_rows, model_cols = _model_apply(model_rows, model_cols, mode, cols, rows)
    got = [r.asDict() for r in w.read("t").collect()]
    assert set(got[0].keys()) == model_cols if got else not model_rows
    assert _normalize(got, model_cols) == _normalize(model_rows, model_cols)
