"""Round-6 ManifestTable hardening (the r5 ADVICE + VERDICT items):

- vacuum ORPHAN GRACE: a never-referenced file younger than the grace
  window survives vacuum — it may be a CONCURRENT writer's staged
  snapshot/dv/segment (OCC protects only the pointer swap, never
  uncommitted files). Superseded committed history still reclaims
  immediately. The end-to-end race (maintain() firing mid-commit of a
  live writer) must land both commits with zero corruption.
- compact() on a PARTITIONED table coalesces NULL-partition files (they
  carry the literal NULL_TOKEN dir name, not None) and never commits a
  junk no-op version when nothing was rewritten.
- checkpoint() shares the OCC retry loop: losing a race to a concurrent
  writer recomputes instead of crashing maintain().
- fsck/vacuum parse each distinct metadata segment at most once across
  all versions (O(distinct segments), not O(versions x segments)).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.manifest import NULL_TOKEN, CommitConflict, ManifestTable


@pytest.fixture()
def base_df(spark):
    return spark.range(30).select(
        F.col("id").alias("k"),
        (F.col("id") % 3 + 1).cast("int").alias("y"),
        (F.col("id") * 10).cast("long").alias("v"),
    )


@pytest.fixture()
def table(spark, tmp_path, base_df):
    t = ManifestTable(spark, str(tmp_path), "t")
    t.create(base_df, partition_by="y")
    return t


# -- ADVICE r5 (high): vacuum must not eat a live writer's staged files --


def test_vacuum_grace_spares_fresh_orphans_reclaims_superseded(table, spark):
    """One vacuum call, both classes: files superseded by a committed
    overwrite reclaim immediately; a fresh never-referenced file (the
    staged-snapshot class) survives the default grace window."""
    old_files = set(table.files())
    table.overwrite(
        spark.createDataFrame([(1, 1, 5)], "k long, y int, v long")
    )
    # simulate a concurrent writer's staged-but-uncommitted output
    staged_dir = os.path.join(table.path, "data", "snap-aaaaaaaaaaaa")
    os.makedirs(staged_dir)
    staged = os.path.join(staged_dir, "part-00000.parquet")
    with open(staged, "wb") as fh:
        fh.write(b"in-flight")
    res = table.vacuum(keep_versions=1)
    assert not any(os.path.isfile(p) for p in old_files), "superseded kept"
    assert os.path.isfile(staged), "vacuum ate a staged (uncommitted) file"
    assert res["skipped_recent_orphans"] >= 1
    # grace 0: operator asserts no live writers -> orphan reclaimed
    table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert not os.path.exists(staged)


def test_maintain_racing_live_writer_no_corruption(spark, tmp_path, base_df):
    """The exact ADVICE scenario: maintain() (with its default vacuum)
    fires while a writer sits BETWEEN snapshot write and pointer swap.
    The writer's staged files must survive vacuum's orphan pass so its
    commit lands referencing existing files; fsck stays clean."""
    t = ManifestTable(spark, str(tmp_path), "race")
    t.create(base_df, partition_by="y")
    writer = ManifestTable(spark, str(tmp_path), "race")
    fired = {"done": False}
    orig_commit = writer._commit

    def commit_with_race(manifest):
        if not fired["done"]:
            fired["done"] = True
            # maintenance cron fires exactly in the vulnerable window
            ManifestTable(spark, str(tmp_path), "race").maintain(
                min_files=2, keep_versions=1
            )
        return orig_commit(manifest)

    writer._commit = commit_with_race
    writer.merge(
        spark.createDataFrame([(1, 2, -7), (99, 2, -8)], "k long, y int, v long"),
        on="k",
        max_retries=3,
    )
    assert fired["done"]
    t2 = ManifestTable(spark, str(tmp_path), "race")
    audit = t2.fsck()
    assert audit["ok"], audit["issues"]
    rows = {(r.k, r.v) for r in t2.read().collect()}
    assert (1, -7) in rows and (99, -8) in rows
    assert len(rows) == 31


# -- ADVICE r5 (medium): NULL partitions must compact -----------------------


@pytest.fixture()
def null_part_table(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path), "np")
    t.create(
        spark.createDataFrame([(0, None, 0), (2, 1, 20)], "k long, y int, v long"),
        partition_by="y",
    )
    # second commit appends new files into both partitions — the null
    # partition now deterministically holds >= 2 data files
    t.merge(
        spark.createDataFrame([(1, None, 10), (3, 1, 30)], "k long, y int, v long"),
        on="k",
    )
    return t


def test_compact_coalesces_null_partition(null_part_table):
    t = null_part_table
    before = [e for e in t.manifest()["entries"]
              if e["partition"] == NULL_TOKEN]
    assert len(before) >= 2, "fixture should fragment the null partition"
    res = t.compact(min_files=2)
    assert NULL_TOKEN in res["touched_partitions"]
    after = [e for e in t.manifest()["entries"]
             if e["partition"] == NULL_TOKEN]
    assert len(after) == 1
    rows = {(r.k, r.v) for r in t.read().collect()}
    assert rows == {(0, 0), (1, 10), (2, 20), (3, 30)}


def test_compact_auto_dv_null_partition_no_junk_commits(null_part_table):
    """auto_dv on a dv-pressured NULL partition must actually rewrite it
    (materializing the mask) and then go quiet — the r5 bug re-flagged
    the partition forever and committed a junk version every cron run."""
    t = null_part_table
    t.dv_ratio_warn = 0.01
    t.delete(F.col("k") == 0, use_dv=True)
    assert t._dv_flagged(t._m_entries(t._raw()))[0] == [NULL_TOKEN]
    res = t.compact(auto_dv=True)
    assert res["files_rewritten"] >= 1, "null partition never compacted"
    assert t._dv_flagged(t._m_entries(t._raw()))[0] == []
    v = t.current_version()
    again = t.compact(auto_dv=True)  # idempotent: nothing flagged now
    assert t.current_version() == v, "junk no-op version committed"
    assert again["files_rewritten"] == 0
    assert {r.k for r in t.read().collect()} == {1, 2, 3}


def test_compact_scoped_to_explicit_null_partition(null_part_table):
    t = null_part_table
    res = t.compact(min_files=2, partitions=[None])
    assert res["touched_partitions"] == [NULL_TOKEN]
    assert {r.k for r in t.read().collect()} == {0, 1, 2, 3}


# -- ADVICE r5 (medium): checkpoint shares the OCC loop ---------------------


def test_checkpoint_occ_retry(spark, tmp_path, base_df):
    t = ManifestTable(spark, str(tmp_path), "ckpt")
    t.create(base_df, partition_by="y")
    for k in (1, 2, 3):
        t.merge(
            spark.createDataFrame(
                [(k, k % 3 + 1, -k)], "k long, y int, v long"
            ),
            on="k",
        )
    raced = {"done": False}
    orig_commit = t._commit

    def commit_with_race(manifest):
        if not raced["done"]:
            raced["done"] = True
            other = ManifestTable(spark, str(tmp_path), "ckpt")
            other.merge(
                spark.createDataFrame([(7, 2, 777)], "k long, y int, v long"),
                on="k",
            )
        return orig_commit(manifest)

    t._commit = commit_with_race
    with pytest.raises(CommitConflict):
        t.checkpoint()  # no retries: loses the race loudly
    raced["done"] = False
    res = t.checkpoint(max_retries=1)  # recomputes from the new head
    assert raced["done"]
    t2 = ManifestTable(spark, str(tmp_path), "ckpt")
    rows = {(r.k, r.v) for r in t2.read().collect()}
    assert (7, 777) in rows  # the interleaved merge is IN the checkpoint
    assert len(rows) == 30
    # checkpoint is content-invisible: empty CDC feed across it
    assert t2.changes(res["version"] - 1, res["version"]).count() == 0


# -- VERDICT r5 item 4: one-commit CDC apply --------------------------------


@pytest.mark.parametrize("use_dv", [True, False])
def test_apply_changes_one_commit(table, spark, use_dv):
    """Upserts + tombstones land as ONE version: update k=1, insert
    k=100, delete k=4 — replica-reader atomicity plus half the churn."""
    v0 = table.current_version()
    ups = spark.createDataFrame(
        [(1, 2, 999), (100, 2, 5)], "k long, y int, v long"
    )
    tombs = spark.createDataFrame([(4, 2)], "k long, y int")
    stats = table.apply_changes(ups, tombs, on="k", use_dv=use_dv)
    assert table.current_version() == v0 + 1
    assert stats["touched_partitions"] == ["2"]  # pruned both sides
    rows = {(r.k, r.v) for r in table.read().collect()}
    assert (1, 999) in rows and (100, 5) in rows
    assert not any(k == 4 for k, _v in rows)
    assert len(rows) == 30  # 30 - deleted + inserted
    if use_dv:
        assert stats["files_rewritten"] == 0


def test_apply_changes_deletes_only_and_empty(table, spark):
    v0 = table.current_version()
    empty = spark.createDataFrame([], "k long, y int, v long")
    tombs = spark.createDataFrame([(7, 2)], "k long, y int")  # k=7 -> y=2
    stats = table.apply_changes(empty, tombs, on="k")
    assert table.current_version() == v0 + 1
    assert stats["files_written"] == 0  # no snapshot for empty upserts
    assert 7 not in {r.k for r in table.read().collect()}
    # fully empty batch: no commit at all
    stats = table.apply_changes(empty, None, on="k")
    assert table.current_version() == v0 + 1
    assert stats["rows_masked"] == 0


# -- VERDICT r5 item 8: dv pressure surfaces at read time -------------------


def test_dv_read_warns_past_broadcast_bound(table, caplog):
    import logging

    table.delete(F.col("k") == 5, use_dv=True)
    with caplog.at_level(logging.WARNING, logger="forklift_spark.manifest"):
        table.read().count()
    assert not [r for r in caplog.records if "broadcast bound" in r.message]
    table.dv_broadcast_rows = 0  # shrink the bound: same read now shuffles
    with caplog.at_level(logging.WARNING, logger="forklift_spark.manifest"):
        assert table.read().count() == 29  # still correct, just shuffled
    hits = [r for r in caplog.records if "broadcast bound" in r.message]
    assert hits and "maintain()" in hits[0].message


# -- VERDICT r5 item 3: metadata-pruned maintenance audits ------------------


def test_fsck_vacuum_parse_distinct_segments_once(spark, tmp_path, monkeypatch):
    """A commit ladder shares most segments by reference, so the fsck /
    vacuum census must parse O(distinct segments), not re-parse every
    segment reference of every version."""
    t = ManifestTable(spark, str(tmp_path), "seg")
    t.segment_target = 4  # several segments per version at toy scale
    base = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 8 + 1).cast("int").alias("y"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    t.create(base, partition_by="y")
    for k in (1, 2, 3, 4):
        t.merge(
            spark.createDataFrame([(k, k % 8 + 1, -k)], "k long, y int, v long"),
            on="k",
        )
    t._seg_cache.clear()
    loads = {"n": 0}
    orig = ManifestTable._load_segment

    def counting(self, rel):
        if rel not in self._seg_cache:  # count real parses, not cache hits
            loads["n"] += 1
        return orig(self, rel)

    monkeypatch.setattr(ManifestTable, "_load_segment", counting)
    audit = t.fsck()
    assert audit["ok"]
    assert audit["segments_parsed"] < audit["segments_total"]
    assert loads["n"] == audit["segments_parsed"]
    t._seg_cache.clear()
    loads["n"] = 0
    res = t.vacuum(keep_versions=len(t.versions()))  # keep all: pure census
    assert res["segments_parsed"] < res["segments_total"]
    assert loads["n"] == res["segments_parsed"]


# -- r6 features: TIMESTAMP AS OF, CHECK constraints, MERGE INTO ------------


def test_timestamp_as_of_resolution(table, spark):
    from forklift_spark.manifest import rewrite_time_travel

    table.merge(
        spark.createDataFrame([(1, 2, 111)], "k long, y int, v long"), on="k"
    )
    hist = table.history()
    assert all(h["committed_at"] is not None for h in hist)
    mid = (hist[0]["committed_at"] + hist[1]["committed_at"]) / 2
    assert table.version_at(mid) == hist[0]["version"]
    assert table.version_at(hist[1]["committed_at"]) == hist[1]["version"]
    with pytest.raises(KeyError):
        table.version_at(hist[0]["committed_at"] - 60)
    # SQL surface: TIMESTAMP AS OF rewrites to the resolved snapshot view
    import datetime

    iso = datetime.datetime.fromtimestamp(
        mid, datetime.timezone.utc
    ).isoformat()
    sql = rewrite_time_travel(
        f"SELECT v FROM t TIMESTAMP AS OF '{iso}' WHERE k = 1",
        lambda n: table if n == "t" else None,
    )
    assert "__v1" in sql
    assert spark.sql(sql).collect()[0].v == 10  # pre-merge value


def test_check_constraints_lifecycle(spark, tmp_path, base_df):
    from forklift_spark.manifest import ConstraintViolation, ManifestTable

    t = ManifestTable(spark, str(tmp_path), "c")
    with pytest.raises(ConstraintViolation, match="v_nonneg"):
        t.create(
            base_df.withColumn("v", F.col("v") - 1000),
            partition_by="y",
            constraints={"v_nonneg": "v >= 0"},
        )
    assert not t.exists()  # rejected create leaves no table
    t.create(base_df, partition_by="y", constraints={"v_nonneg": "v >= 0"})
    v1 = t.current_version()
    bad = spark.createDataFrame([(1, 2, -5)], "k long, y int, v long")
    for op in ("merge", "dv", "apply", "overwrite"):
        with pytest.raises(ConstraintViolation, match="v_nonneg"):
            if op == "merge":
                t.merge(bad, on="k")
            elif op == "dv":
                t.merge(bad, on="k", use_dv=True)
            elif op == "apply":
                t.apply_changes(bad, None, on="k")
            else:
                t.overwrite(bad)
    assert t.current_version() == v1  # nothing committed
    # NULL passes (SQL three-valued CHECK)
    t.merge(
        spark.createDataFrame([(1, 2, None)], "k long, y int, v long"), on="k"
    )
    # declaring over existing data validates the LIVE table first
    with pytest.raises(ConstraintViolation, match="v_small"):
        t.set_constraint("v_small", "v < 5")
    t.set_constraint("v_cap", "v <= 290")
    with pytest.raises(ConstraintViolation, match="v_cap"):
        t.merge(
            spark.createDataFrame([(2, 3, 291)], "k long, y int, v long"),
            on="k",
        )
    t.drop_constraint("v_cap")
    t.merge(
        spark.createDataFrame([(2, 3, 291)], "k long, y int, v long"), on="k"
    )
    assert {r.v for r in t.read().filter("k = 2").collect()} == {291}
    # constraints survive unrelated commits (carried in every manifest)
    assert "v_nonneg" in (t._raw().get("constraints") or {})


def test_merge_into_conditional_clauses(table, spark):
    src = spark.createDataFrame(
        [(1, 2, 500, "U"), (4, 2, 0, "D"), (7, 2, 0, "X"), (99, 1, 7, "I")],
        "k long, y int, v long, op string",
    )
    stats = table.merge_into(
        src,
        on="k",
        when_matched_update={"v": "s.v + t.v"},
        matched_update_condition="s.op = 'U'",
        when_matched_delete="s.op = 'D'",
    )
    rows = {r.k: r.v for r in table.read().collect()}
    assert rows[1] == 510  # updated: s.v + t.v = 500 + 10
    assert 4 not in rows  # deleted
    assert rows[7] == 70  # matched, condition false: untouched
    assert rows[99] == 7  # inserted
    assert rows[2] == 20  # not in source: carried
    assert len(rows) == 30
    assert stats["touched_partitions"]  # pruned scope, OCC tokens named
    # op lands in the evolved schema for inserted rows, NULL elsewhere
    got = {r.k: r.op for r in table.read().select("k", "op").collect()}
    assert got[99] == "I" and got[2] is None


def test_merge_into_no_insert_and_update_all(table, spark):
    src = spark.createDataFrame(
        [(1, 2, 777), (100, 2, 1)], "k long, y int, v long"
    )
    table.merge_into(src, on="k", when_not_matched_insert=False)
    rows = {r.k: r.v for r in table.read().collect()}
    assert rows[1] == 777 and 100 not in rows and len(rows) == 30


def test_cli_constraints(spark, tmp_path, capsys):
    import json

    from forklift_spark.cli import main

    t = ManifestTable(spark, str(tmp_path), "cc")
    t.create(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    assert main(["manifest", "set-constraint", str(tmp_path), "cc",
                 "--name", "v_cap", "--expr", "v <= 40"]) in (None, 0)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraint"] == "v_cap"
    assert "v_cap" in t._raw().get("constraints", {})
    assert main(["manifest", "set-constraint", str(tmp_path), "cc"]) == 2
    capsys.readouterr()
    assert main(["manifest", "drop-constraint", str(tmp_path), "cc",
                 "--name", "v_cap"]) in (None, 0)
    assert not t._raw().get("constraints")


# -- merge-key zone-map file pruning (r6: the Delta MERGE prune shape) --


@pytest.fixture()
def clustered(spark, tmp_path):
    """Key-clustered table (time-ordered ingest shape): 8 files per
    partition with DISJOINT k ranges, so a narrow key batch can prove
    most files matchless from their zone maps alone."""
    df = spark.range(800).select(
        F.col("id").alias("k"),
        (F.col("id") % 2 + 1).cast("int").alias("y"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    t = ManifestTable(spark, str(tmp_path), "t")
    t.create(df.repartitionByRange(8, "k"), partition_by="y")
    return t


def test_merge_dv_prunes_scan_by_key_range(clustered, spark):
    part_files = len([e for e in clustered.manifest()["entries"]
                      if e["partition"] == "1"])
    assert part_files >= 4
    batch = spark.createDataFrame(
        [(2, 1, 111), (4, 1, 222), (801, 1, 999)], "k long, y int, v long"
    )
    st = clustered.merge(batch, on="k", use_dv=True)
    # only the files whose k-range can hold {2, 4, 801} were scanned
    assert st["files_scanned"] < part_files
    got = {r.k: r.v for r in clustered.read().filter("k in (2, 4, 801)").collect()}
    assert got == {2: 111, 4: 222, 801: 999}
    assert clustered.read().count() == 801  # 2 updates + 1 insert


def test_merge_rewrite_prunes_rewrites_by_key_range(clustered, spark):
    batch = spark.createDataFrame([(4, 1, 333)], "k long, y int, v long")
    st = clustered.merge(batch, on="k")
    part_files = len([e for e in clustered.manifest(1)["entries"]
                      if e["partition"] == "1"])
    assert 0 < st["files_rewritten"] < part_files
    assert clustered.read().filter("k = 4").collect()[0].v == 333
    assert clustered.read().count() == 800


def test_delete_keys_and_apply_changes_prune(clustered, spark):
    tombs = spark.createDataFrame([(5, 2)], "k long, y int")
    st = clustered.delete_keys(tombs, on="k")
    assert st["files_scanned"] < 8
    assert clustered.read().filter("k = 5").count() == 0
    ups = spark.createDataFrame([(6, 1, 66)], "k long, y int, v long")
    tombs2 = spark.createDataFrame([(7, 2)], "k long, y int")
    st2 = clustered.apply_changes(ups, tombs2, on="k")
    assert st2["files_scanned"] < 16
    rows = {r.k: r.v for r in clustered.read().filter("k in (6, 7)").collect()}
    assert rows == {6: 66}


def test_key_prune_conservative_cases(spark, tmp_path):
    """Round-robin files (full-range stats) never prune — and results
    stay exact; NULL-only batch keys skip pruning; a string key prunes
    lexicographically."""
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = ManifestTable(spark, str(tmp_path / "rr"), "rr")
    t.create(df.repartition(6))  # round-robin: every file spans all keys
    st = t.merge(
        spark.createDataFrame([(1, 11)], "k long, v long"), on="k", use_dv=True
    )
    assert 1 <= st["files_scanned"] <= 6  # never over-prunes the match
    assert t.read().filter("k = 1").collect()[0].v == 11

    nulls = spark.createDataFrame([(None, 5)], "k long, v long")
    st2 = t.merge(nulls, on="k", use_dv=True)  # NULL keys never equi-join
    assert t.read().filter("k is null").count() == 1

    s = ManifestTable(spark, str(tmp_path / "s"), "s")
    s.create(
        spark.createDataFrame(
            [(c, 1) for c in "abcdefgh"], "k string, v long"
        ).repartitionByRange(4, "k")
    )
    st3 = s.merge(
        spark.createDataFrame([("b", 9)], "k string, v long"),
        on="k", use_dv=True,
    )
    assert st3["files_scanned"] < 4
    assert {r.v for r in s.read().filter("k = 'b'").collect()} == {9}


# ---------------------------------------------------------------------------
# Bloom-probe merge pruning: files whose key BLOOM proves no batch key
# present are dropped from the merge scope even when their [min, max]
# ranges fully overlap (hash-distributed keys — the regime zone maps
# cannot cut).
# ---------------------------------------------------------------------------


@pytest.fixture()
def hash_distributed(spark, tmp_path):
    """4 files hash-partitioned on k: every file spans ~the full key
    range (zone maps prune nothing), key SETS are disjoint (blooms
    prune everything but the owner file)."""
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t = ManifestTable(spark, str(tmp_path), "hd")
    t.create(df.repartition(4, "k"), bloom_cols=["k"])
    return t


def _keys_of_one_file(t, spark):
    """(file_key, [two keys from that file]) via input_file_name."""
    import os
    from urllib.parse import unquote

    rows = (
        spark.read.parquet(
            *[os.path.join(t.path, e["path"]) for e in t.manifest()["entries"]]
        )
        .select(F.input_file_name().alias("f"), "k")
        .collect()
    )
    by_file: dict = {}
    for r in rows:
        key = unquote(os.path.relpath(r["f"].split("://", 1)[-1], t.path))
        by_file.setdefault(key, []).append(r["k"])
    fkey, ks = sorted(by_file.items())[0]
    return fkey, sorted(ks)[:2]


def test_bloom_probe_prunes_inside_overlapping_ranges(hash_distributed, spark):
    t = hash_distributed
    entries = t.manifest()["entries"]
    assert len(entries) == 4
    # ranges overlap: zone maps alone cannot isolate one file
    los = [int(e["stats"]["k"][0]) for e in entries]
    his = [int(e["stats"]["k"][1]) for e in entries]
    assert max(los) < min(his), "fixture must produce overlapping ranges"
    _fkey, ks = _keys_of_one_file(t, spark)
    batch = spark.createDataFrame([(k, k * 100) for k in ks], "k long, v long")
    st = t.merge(batch, on="k", use_dv=True)
    assert st["files_scanned"] == 1, st
    got = {r.k: r.v for r in t.read().filter(F.col("k").isin(ks)).collect()}
    assert got == {k: k * 100 for k in ks}
    assert t.read().count() == 400


def test_bloom_probe_never_false_drops(hash_distributed, spark):
    """A batch touching every file scans every file, and every update
    lands — the no-false-negative side of the probe."""
    t = hash_distributed
    keys = [r.k for r in t.read().select("k").sample(0.05, seed=1).collect()]
    assert len(keys) >= 8
    batch = spark.createDataFrame([(k, -k) for k in keys], "k long, v long")
    st = t.merge(batch, on="k", use_dv=True)
    assert st["files_scanned"] >= 3  # sampled keys hit (almost) every file
    got = {r.k: r.v for r in t.read().filter(F.col("k").isin(keys)).collect()}
    assert got == {k: -k for k in keys}


def test_bloom_probe_integral_widening_prunes(hash_distributed, spark):
    """int batch against a long table is probe-exact (integral family):
    pruning still engages and the merge is correct."""
    t = hash_distributed
    _fkey, ks = _keys_of_one_file(t, spark)
    batch = spark.createDataFrame(
        [(int(k), 7) for k in ks], "k int, v long"
    )
    st = t.merge(batch, on="k", use_dv=True)
    assert st["files_scanned"] == 1, st
    assert {r.v for r in t.read().filter(F.col("k").isin(ks)).collect()} == {7}


def test_bloom_probe_skips_lossy_dtype_mix(hash_distributed, spark):
    """double batch vs long table can join-match through precision loss,
    so the bloom probe must NOT engage — the single-file cut the long
    batch gets (see test above) must not happen here. Zone maps may
    still trim edge files by [min, max]; that path is float-monotone
    and stays active."""
    t = hash_distributed
    _fkey, ks = _keys_of_one_file(t, spark)
    batch = spark.createDataFrame(
        [(float(k), 9) for k in ks], "k double, v long"
    )
    st = t.merge(batch, on="k", use_dv=True)
    assert st["files_scanned"] > 1, st
    assert {r.v for r in t.read().filter(F.col("k").isin(ks)).collect()} == {9}


def test_bloom_probe_delete_keys_and_apply_changes(hash_distributed, spark):
    """delete_keys and apply_changes share _merge_scope, so the bloom
    cut applies to both; deletes and upserts stay exact."""
    t = hash_distributed
    _fkey, ks = _keys_of_one_file(t, spark)
    st = t.delete_keys(
        spark.createDataFrame([(ks[0],)], "k long"), on="k"
    )
    assert st["files_scanned"] == 1, st
    assert t.read().filter(F.col("k") == ks[0]).count() == 0
    ups = spark.createDataFrame([(ks[1], 55)], "k long, v long")
    tombs = spark.createDataFrame([(10**9,)], "k long")  # matches nothing
    st2 = t.apply_changes(ups, tombs, on="k")
    assert st2["files_scanned"] <= 2, st2
    assert t.read().filter(F.col("k") == ks[1]).collect()[0].v == 55


def test_read_stats_hook_and_degraded_pruning_warning(spark, tmp_path, caplog):
    """read() surfaces planning counters (VERDICT r6 item 8) and WARNS
    when a where-column's pruning degraded to full scan because the
    planned entries carry no stats (legacy upgrade shape)."""
    import json as _json
    import logging
    import os

    from pyspark.sql import functions as F

    from forklift_spark.manifest import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "m"), "m")
    t.create(
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p"),
            (F.col("id") * 2).alias("v"),
        ),
        partition_by="p",
    )
    # healthy table: stats present, counters populated, no warning
    with caplog.at_level(logging.WARNING, logger="forklift_spark.manifest"):
        got = t.read(where={"k": (10, 12)})
        assert got.count() == 3
    st = t.last_read_stats
    assert st["files_planned"] >= 1 and st["stat_less"]["k"] == 0
    assert not [r for r in caplog.records if "degraded" in r.message]

    # legacy shape: hand-write a manifest whose inline entries carry NO
    # stats (what a pre-stats upgrade leaves behind), swap the pointer
    m = t.manifest()
    for e in m["entries"]:
        e.pop("stats", None)
        e.pop("bloom", None)
    m.pop("segments", None)
    m["version"] = m["version"] + 1
    with open(os.path.join(t.path, f"manifest-v{m['version']}.json"), "w") as fh:
        _json.dump(m, fh)
    with open(t._pointer_path(), "w") as fh:
        fh.write(str(m["version"]))

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="forklift_spark.manifest"):
        got = t.read(where={"k": (10, 12)})
        assert got.count() == 3          # stats are never a correctness dep
    st = t.last_read_stats
    assert st["stat_less"]["k"] == st["files_planned"] > 1
    warns = [r for r in caplog.records if "degraded to full scan" in r.message]
    assert warns and "'k'" in warns[0].message
