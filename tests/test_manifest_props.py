"""Property-based ManifestTable semantics: random MERGE/DELETE/COMPACT
sequences vs an executable dict model (hypothesis) — same strategy as
the writer/CDC property tests, applied to the r4 manifest format.

Merges go through the composite key (y, k) — partition + key — which is
the documented contract for keys that may move partitions, and gives the
model exact semantics: merge = dict update, delete = value filter,
compact = identity.

Invariants checked after EVERY operation:
- table contents == model contents;
- every version ever committed stays readable (snapshot isolation) and
  replays its historical state exactly;
- data files named by any retained manifest exist on disk.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from forklift_spark.manifest import ManifestTable

keys = st.integers(min_value=0, max_value=9)
parts = st.integers(min_value=1, max_value=3)
vals = st.integers(min_value=-50, max_value=50)

rowsets = st.dictionaries(
    st.tuples(parts, keys), vals, min_size=1, max_size=5
)


@st.composite
def operations(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    ops = []
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["merge", "merge", "merge_dv", "delete", "delete_dv",
                 "compact", "checkpoint"]
            )
        )
        if kind in ("merge", "merge_dv"):
            ops.append((kind, draw(rowsets)))
        elif kind in ("delete", "delete_dv"):
            ops.append((kind, draw(vals)))
        else:
            ops.append((kind, None))
    return ops


def _apply_model(model: dict, op, arg):
    if op in ("merge", "merge_dv"):
        return {**model, **arg}  # replace-by-(y,k) or insert
    if op in ("delete", "delete_dv"):
        return {yk: v for yk, v in model.items() if v != arg}
    return dict(model)  # compact/checkpoint: layout/metadata only


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(base=rowsets, ops=operations())
def test_manifest_random_ops_match_model(spark, tmp_path_factory, base, ops):
    root = str(tmp_path_factory.mktemp("mprops"))
    t = ManifestTable(spark, root, "t")

    def df_of(rows: dict):
        return spark.createDataFrame(
            [(y, k, v) for (y, k), v in rows.items()], "y int, k long, v long"
        )

    t.create(df_of(base), partition_by="y")
    model = dict(base)
    history = {t.current_version(): dict(model)}
    for op, arg in ops:
        if op == "merge":
            t.merge(df_of(arg), on=["y", "k"])
        elif op == "merge_dv":
            t.merge(df_of(arg), on=["y", "k"], use_dv=True)
        elif op == "delete":
            t.delete(F.col("v") == arg)
        elif op == "delete_dv":
            t.delete(F.col("v") == arg, use_dv=True)
        elif op == "checkpoint":
            t.checkpoint()  # metadata-only commit (r5 segments)
        else:
            t.compact(min_files=2)
        model = _apply_model(model, op, arg)
        got = {(r.y, r.k): r.v for r in t.read().collect()}
        assert got == model, f"after {op}({arg})"
        # segment zone maps (r5) must never change results: a predicate
        # read through metadata pruning == the model filtered, at every
        # random dv/compact/checkpoint state
        lo, hi = -10, 10
        pruned = {
            (r.y, r.k): r.v
            for r in t.read(where={"v": (lo, hi)}).collect()
        }
        assert pruned == {
            yk: v for yk, v in model.items() if lo <= v <= hi
        }, f"where-read drifted after {op}({arg})"
        history[t.current_version()] = dict(model)
    # snapshot isolation: every committed version still replays its state
    for v, snap in history.items():
        got_v = {(r.y, r.k): r.v for r in t.read(version=v).collect()}
        assert got_v == snap, f"version {v} drifted"
    # change-feed soundness: replaying changes(a, b) onto state(a)
    # reproduces state(b) for every consecutive committed pair
    committed = sorted(history)
    for va, vb in zip(committed, committed[1:]):
        feed = [
            ((r.y, r.k), r.v, r._change_type)
            for r in t.changes(va, vb).collect()
        ]
        replay = dict(history[va])
        for yk, v, kind in feed:
            if kind == "delete":
                assert replay.pop(yk) == v, f"delete of absent row {yk}"
        for yk, v, kind in feed:
            if kind == "insert":
                replay[yk] = v
        assert replay == history[vb], f"changes({va},{vb}) replay drifted"
    # every referenced file exists
    for v in t.versions():
        assert all(os.path.isfile(p) for p in t.files(v))


# ---------------------------------------------------------------------------
# Differential property: the two upsert implementations must agree
# ---------------------------------------------------------------------------
# keyed by k alone, partition DERIVED from the key (y = k % 3) so keys
# never move partitions — the regime where the writer's global upsert
# and the manifest's partition-scoped merge must coincide exactly (a
# moving key is the documented divergence: manifest inserts into the
# new partition and keeps the old row unless merged on the composite)
keyed_rowsets = st.dictionaries(keys, vals, min_size=1, max_size=5)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(base=keyed_rowsets, seq=st.lists(keyed_rowsets, min_size=1, max_size=3),
       dv=st.booleans())
def test_writer_and_manifest_upsert_agree(spark, tmp_path_factory, base, seq, dv):
    """ParquetTableWriter's anti-join full-rewrite upsert and
    ManifestTable.merge (rewrite or dv mode) implement the SAME logical
    upsert — random batch sequences must leave identical tables. Binds
    the simple path and the scale path to one semantics."""
    from forklift_spark.writer import ParquetTableWriter

    root = tmp_path_factory.mktemp("diff")
    w = ParquetTableWriter(spark, str(root / "plain"))
    m = ManifestTable(spark, str(root), "manifest")

    def df_of(rows: dict):
        return spark.createDataFrame(
            [(k % 3, k, v) for k, v in rows.items()], "y int, k long, v long"
        )

    w.write(df_of(base), "t", mode="overwrite")
    m.create(df_of(base), partition_by="y")
    for batch in seq:
        w.write(df_of(batch), "t", mode="upsert", primary_key="k")
        m.merge(df_of(batch), on="k", use_dv=dv)
    got_w = sorted((r.y, r.k, r.v) for r in w.read("t").collect())
    got_m = sorted((r.y, r.k, r.v) for r in m.read().collect())
    assert got_w == got_m
