"""Delta deletion-vector read path: Z85 + portable RoaringBitmapArray
codec and the v3 ``deletionVectors`` reader feature.

Fixtures are built BY HAND from the public delta.io PROTOCOL.md DV
format (version-byte file, ``[int32 BE size][bitmap][int32 BE crc]``
blobs, 'u'/'i'/'p' storage types) and the RoaringFormatSpec container
layouts — the reader must work against files this engine didn't write.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import pytest
from pyspark.sql import functions as F

from forklift_spark.connections.deltalite import (
    DeltaLiteTable,
    DeltaUnsupported,
    dv_file_path,
    dv_positions,
)
from forklift_spark.functions.roaring import (
    deserialize_roaring64,
    serialize_roaring64,
    z85_decode,
    z85_encode,
)
from tests.test_deltalite import (
    SCHEMA,
    _add,
    _commit,
    _meta_action,
    _one_parquet_file,
)

# ---------------------------------------------------------------- codec


def test_z85_roundtrip_uuid_and_padding():
    u = uuid.UUID("0123456789abcdef0123456789abcdef")
    enc = z85_encode(u.bytes)
    assert len(enc) == 20
    assert z85_decode(enc, 16) == u.bytes
    # unpadded payloads: true length restored via the length arg
    for n in range(1, 9):
        data = bytes(range(n))
        assert z85_decode(z85_encode(data), n) == data
    with pytest.raises(ValueError):
        z85_decode("abc")  # not a multiple of 5
    with pytest.raises(ValueError):
        z85_decode("~~~~~")  # char outside the Z85 alphabet


@pytest.mark.parametrize("values", [
    [],
    [0],
    [0, 1, 2, 65535, 65536, 1 << 31, (1 << 32) - 1],
    [(1 << 32) + 7, (5 << 32) + 123456, (5 << 32) + 123457],
    list(range(5000)),                       # bitset container (>4096)
    [i * 3 for i in range(4097)],            # bitset spanning 16-bit keys
    [1 << 40, (1 << 40) + 1, 1 << 50],
])
def test_roaring64_roundtrip(values):
    assert deserialize_roaring64(serialize_roaring64(values)) == sorted(set(values))


def test_roaring64_run_container_decode():
    """Real Delta writers emit run containers (cookie 12347); hand-build
    one: high word 0, one run container [100..199] + [500..500]."""
    n = 1
    cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flags = bytes([0b1])                  # container 0 is a run
    header = struct.pack("<HH", 0, 101 - 1 + 1)  # key 0, cardinality-1
    body = struct.pack("<H", 2) + struct.pack("<HH", 100, 99) \
        + struct.pack("<HH", 500, 0)
    rb32 = cookie + run_flags + header + body  # <4 containers: no offsets
    blob = struct.pack("<i", 1681511377) + struct.pack("<q", 1) \
        + struct.pack("<i", 0) + rb32
    assert deserialize_roaring64(blob) == list(range(100, 200)) + [500]


def test_roaring64_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        deserialize_roaring64(struct.pack("<iq", 42, 0))
    with pytest.raises(ValueError):
        deserialize_roaring64(b"\x00\x01")


# ------------------------------------------------------- DV file layout


def _write_dv_file(path: str, blobs: list[bytes]) -> list[int]:
    """Write a spec-shaped DV file (version byte 1, then per blob
    [int32 BE size][data][int32 BE crc32]); returns each blob's offset."""
    offsets = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        pos = 1
        for data in blobs:
            offsets.append(pos)
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 4 + len(data) + 4
    return offsets


def _u_descriptor(tdir: str, positions: list[int], prefix: str = "") -> dict:
    """Materialize a DV file under the table and return its 'u'
    descriptor (path derivation per spec: prefix + z85(uuid))."""
    u = uuid.uuid4()
    d = os.path.join(tdir, prefix) if prefix else tdir
    os.makedirs(d, exist_ok=True)
    data = serialize_roaring64(positions)
    offs = _write_dv_file(os.path.join(d, f"deletion_vector_{u}.bin"), [data])
    return {"storageType": "u", "pathOrInlineDv": prefix + z85_encode(u.bytes),
            "offset": offs[0], "sizeInBytes": len(data),
            "cardinality": len(positions)}


def _i_descriptor(positions: list[int]) -> dict:
    data = serialize_roaring64(positions)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(data),
            "offset": None, "sizeInBytes": len(data),
            "cardinality": len(positions)}


def test_dv_file_path_u_with_prefix(tmp_path):
    tdir = str(tmp_path)
    desc = _u_descriptor(tdir, [1, 2], prefix="ab/")
    p = dv_file_path(tdir, desc)
    assert p.startswith(os.path.join(tdir, "ab/deletion_vector_"))
    assert dv_positions(tdir, desc) == [1, 2]


def test_dv_checksum_and_size_validation(tmp_path):
    tdir = str(tmp_path)
    desc = _u_descriptor(tdir, [3, 4, 5])
    path = dv_file_path(tdir, desc)
    assert dv_positions(tdir, desc) == [3, 4, 5]
    with pytest.raises(ValueError, match="size mismatch"):
        dv_positions(tdir, dict(desc, sizeInBytes=desc["sizeInBytes"] + 1))
    with pytest.raises(ValueError, match="cardinality mismatch"):
        dv_positions(tdir, dict(desc, cardinality=99))
    # corrupt one data byte -> crc must catch it
    with open(path, "r+b") as fh:
        fh.seek(desc["offset"] + 4 + 5)
        b = fh.read(1)
        fh.seek(desc["offset"] + 4 + 5)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        dv_positions(tdir, desc)


# ----------------------------------------------------- reader semantics


def _v3_protocol() -> dict:
    return {"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }}


@pytest.fixture()
def dv_table(spark, tmp_path):
    """Unpartitioned v3 table: one file with rows k=0..9, DV deleting
    physical positions {1, 3, 8} (written in DESCENDING k order so row
    position != k — position-vs-value confusion must fail the test)."""
    tdir = str(tmp_path / "dvt")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("r"), F.col("id")).alias("v"),
        F.lit(1).alias("p"),
    ).orderBy(F.desc("k"))  # file order: k = 9,8,...,0
    _one_parquet_file(spark, df.coalesce(1).sortWithinPartitions(F.desc("k")),
                      os.path.join(tdir, "f1.parquet"))
    desc = _u_descriptor(tdir, [1, 3, 8])  # deletes k = 8, 6, 1
    add = _add("f1.parquet", {})
    add["add"]["deletionVector"] = desc
    _commit(log, 0, [_v3_protocol(), _meta_action(partition_cols=()), add])
    return tdir


def test_dv_read_masks_physical_positions(spark, dv_table):
    rows = DeltaLiteTable(spark, dv_table).read().collect()
    ks = sorted(r.k for r in rows)
    assert ks == [0, 2, 3, 4, 5, 7, 9]  # positions 1,3,8 = k 8,6,1


def test_dv_update_replaces_descriptor(spark, dv_table):
    """Re-adding the path with a WIDER DV (positions 0..4) replaces the
    old mask — last add wins, per spec."""
    log = os.path.join(dv_table, "_delta_log")
    add = _add("f1.parquet", {})
    add["add"]["deletionVector"] = _i_descriptor([0, 1, 2, 3, 4])
    _commit(log, 1, [add])
    t = DeltaLiteTable(spark, dv_table)
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4]
    # time travel still sees the v0 mask
    assert sorted(r.k for r in t.read(version=0).collect()) == [0, 2, 3, 4, 5, 7, 9]


def test_dv_inline_and_multiple_files(spark, tmp_path):
    """Two files, one masked inline, one on disk, one untouched row set;
    partitioned table exercises the group/union path."""
    tdir = str(tmp_path / "dvp")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def pdf(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit("x"), F.col("id")).alias("v"))

    _one_parquet_file(spark, pdf(0, 5), os.path.join(tdir, "p=1/a.parquet"))
    _one_parquet_file(spark, pdf(10, 15), os.path.join(tdir, "p=2/b.parquet"))
    _one_parquet_file(spark, pdf(20, 25), os.path.join(tdir, "p=2/c.parquet"))
    a1 = _add("p=1/a.parquet", {"p": "1"})
    a1["add"]["deletionVector"] = _i_descriptor([0, 4])      # k 0 and 4
    a2 = _add("p=2/b.parquet", {"p": "2"})
    a2["add"]["deletionVector"] = _u_descriptor(tdir, [2])   # k 12
    a3 = _add("p=2/c.parquet", {"p": "2"})
    _commit(log, 0, [_v3_protocol(), _meta_action(), a1, a2, a3])
    rows = DeltaLiteTable(spark, tdir).read().collect()
    assert sorted(r.k for r in rows) == [1, 2, 3, 10, 11, 13, 14, 20, 21, 22, 23, 24]
    assert all(r.p in (1, 2) for r in rows)


def test_unsupported_reader_feature_still_refuses(spark, tmp_path):
    tdir = str(tmp_path / "cm")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors", "variantType"]}},
        _meta_action(),
    ])
    with pytest.raises(DeltaUnsupported, match="variantType"):
        DeltaLiteTable(spark, tdir).read()


def test_changes_refuses_dv_range(spark, dv_table):
    """A DV-carrying add is a delete — the append-only feed must refuse
    the range rather than misreport it as inserts."""
    log = os.path.join(dv_table, "_delta_log")
    add = _add("f1.parquet", {})
    add["add"]["deletionVector"] = _i_descriptor([0])
    _commit(log, 1, [add])
    t = DeltaLiteTable(spark, dv_table)
    with pytest.raises(NotImplementedError, match="not append-only"):
        t.changes(0)


# ------------------------------------------------- native DV export/sync


def test_export_native_dv_mode(spark, tmp_path):
    """dv_mode='native': a dv-masked manifest table exports WITHOUT
    compacting — masks become real Delta DVs (v3 protocol) and the
    external replay hides exactly the masked rows."""
    from pyspark.sql import functions as F

    from forklift_spark.connections.deltalite import (
        export_manifest_to_delta,
        sync_manifest_to_delta,
    )
    from forklift_spark.manifest import ManifestTable

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4 + 1).cast("int").alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    t = ManifestTable(spark, str(tmp_path / "m"), "m")
    t.create(df, partition_by="p")
    t.merge(spark.createDataFrame([(7, 4, 777), (11, 4, 1111)],
                                  "k long, p int, v long"),
            on="k", use_dv=True)
    assert any(e.get("dv") for e in t.manifest()["entries"])

    dest = str(tmp_path / "d")
    with pytest.raises(ValueError, match="dv_mode='native'"):
        export_manifest_to_delta(t, dest)  # default still refuses
    stats = export_manifest_to_delta(t, dest, dv_mode="native")
    assert stats["rows"] == 100  # live rows (dv-masked excluded)

    ext = DeltaLiteTable(spark, dest)
    got = {(r.k, r.p, r.v) for r in ext.read().collect()}
    want = {(r.k, r.p, r.v) for r in t.read().collect()}
    assert got == want and (7, 4, 777) in got and (7, 4, 70) not in got

    # incremental native sync: another dv merge becomes a DV-update
    # re-add of the kept file, not a rewrite
    t.merge(spark.createDataFrame([(15, 4, 1500)], "k long, p int, v long"),
            on="k", use_dv=True)
    r = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r["mode"] == "incremental" and r["dv_updated"] >= 1
    got2 = {(r2.k, r2.p, r2.v) for r2 in DeltaLiteTable(spark, dest)
            .read().collect()}
    assert got2 == {(r2.k, r2.p, r2.v) for r2 in t.read().collect()}
    assert (15, 4, 1500) in got2 and (15, 4, 150) not in got2

    # noop after convergence
    assert sync_manifest_to_delta(t, dest, dv_mode="native")["mode"] == "noop"


def test_sync_native_dv_protocol_upgrade(spark, tmp_path):
    """A v1-exported table whose LATER sync carries the first DV must
    upgrade the protocol in that commit — and a mask cleared by
    restore() must clear the exported DV too."""
    from pyspark.sql import functions as F

    from forklift_spark.connections.deltalite import sync_manifest_to_delta
    from forklift_spark.manifest import ManifestTable

    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 2 + 1).cast("int").alias("p"),
        (F.col("id") * 10).alias("v"))
    t = ManifestTable(spark, str(tmp_path / "m"), "m")
    t.create(df, partition_by="p")
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest)           # v1 log, no masks
    pre_dv_version = t.current_version()
    t.merge(spark.createDataFrame([(3, 2, 33)], "k long, p int, v long"),
            on="k", use_dv=True)              # 3 -> p = 3%2+1 = 2
    r = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r["dv_updated"] + r["added"] >= 1
    import json as _json
    import os as _os
    with open(_os.path.join(dest, "_delta_log",
                            f"{r['delta_version']:020d}.json")) as fh:
        acts = [_json.loads(l) for l in fh if l.strip()]
    assert acts[0].get("protocol", {}).get("minReaderVersion") == 3
    ext = {(x.k, x.p, x.v) for x in DeltaLiteTable(spark, dest)
           .read().collect()}
    assert (3, 2, 33) in ext and (3, 2, 30) not in ext

    # restore to the pre-dv version: the next sync clears the mask
    t.restore(pre_dv_version)
    r2 = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r2["mode"] == "incremental"
    ext2 = {(x.k, x.p, x.v) for x in DeltaLiteTable(spark, dest)
            .read().collect()}
    assert ext2 == {(x.k, x.p, x.v) for x in t.read().collect()}
    assert (3, 2, 30) in ext2


def test_dv_update_commit_order_independent(spark, dv_table):
    """ADVICE r7: a real DV-update commit holds remove(path, oldDV) and
    add(path, newDV) in writer-dependent line order — with the remove
    line AFTER the add, path-keyed line-order replay would drop the
    file entirely. Spec reconciliation is (path, dv uniqueId)-keyed and
    order-independent within a commit."""
    log = os.path.join(dv_table, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        acts = [json.loads(l) for l in fh if l.strip()]
    old_dv = next(a["add"]["deletionVector"] for a in acts if "add" in a)
    add = _add("f1.parquet", {})
    add["add"]["deletionVector"] = _i_descriptor([0, 1, 2, 3, 4])
    # add FIRST, remove (carrying the OLD dv) SECOND
    _commit(log, 1, [add, {"remove": {
        "path": "f1.parquet", "deletionTimestamp": 1700000000001,
        "dataChange": True, "deletionVector": old_dv}}])
    t = DeltaLiteTable(spark, dv_table)
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_dv_remove_mismatching_dv_keeps_newer_logical_file(spark, dv_table):
    """A remove carrying a STALE dv uniqueId (e.g. a lost-race writer)
    must not tombstone the newer logical file at the same path."""
    log = os.path.join(dv_table, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        acts = [json.loads(l) for l in fh if l.strip()]
    old_dv = next(a["add"]["deletionVector"] for a in acts if "add" in a)
    add = _add("f1.parquet", {})
    add["add"]["deletionVector"] = _i_descriptor([0, 1, 2, 3, 4])
    _commit(log, 1, [add])                       # DV update (new uid)
    _commit(log, 2, [{"remove": {                 # stale remove: old uid
        "path": "f1.parquet", "deletionTimestamp": 1700000000002,
        "dataChange": True, "deletionVector": old_dv}}])
    t = DeltaLiteTable(spark, dv_table)
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_dv_relative_path_and_space_in_dir(spark, tmp_path, monkeypatch):
    """ADVICE r7: with a RELATIVE table path (and a space in the dir
    name, which Spark percent-encodes in _metadata.file_path), the DV
    anti-join must still match — a silent mismatch would KEEP deleted
    rows."""
    monkeypatch.chdir(tmp_path)
    tdir = "dv table"                             # relative, with space
    abs_tdir = str(tmp_path / tdir)               # Spark writes need abs
    log = os.path.join(abs_tdir, "_delta_log")
    os.makedirs(log)
    df = spark.range(0, 6).select(
        F.col("id").alias("k"),
        F.concat(F.lit("r"), F.col("id")).alias("v"),
        F.lit(1).alias("p"))
    _one_parquet_file(spark, df.coalesce(1).sortWithinPartitions("k"),
                      os.path.join(abs_tdir, "f1.parquet"))
    add = _add("f1.parquet", {})
    add["add"]["deletionVector"] = _i_descriptor([1, 4])
    _commit(log, 0, [_v3_protocol(), _meta_action(partition_cols=()), add])
    rows = DeltaLiteTable(spark, tdir).read().collect()
    assert sorted(r.k for r in rows) == [0, 2, 3, 5]


def test_checkpoint_export_partitioned_foreign_table(spark, tmp_path):
    """checkpoint_delta_export also works on a PARTITIONED table this
    engine didn't write: partition values and DV descriptors survive
    the parquet round-trip, and the table replays from the checkpoint
    alone after the JSON commits are cleaned."""
    from forklift_spark.connections.deltalite import (
        checkpoint_delta_export,
    )

    tdir = str(tmp_path / "pt")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def pdf(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit("x"), F.col("id")).alias("v"))

    _one_parquet_file(spark, pdf(0, 5).coalesce(1).sortWithinPartitions("k"),
                      os.path.join(tdir, "p=1/a.parquet"))
    _one_parquet_file(spark, pdf(10, 15).coalesce(1)
                      .sortWithinPartitions("k"),
                      os.path.join(tdir, "p=2/b.parquet"))
    a1 = _add("p=1/a.parquet", {"p": "1"})
    a1["add"]["deletionVector"] = _u_descriptor(tdir, [0, 3])  # k 0, 3
    a2 = _add("p=2/b.parquet", {"p": "2"})
    _commit(log, 0, [_v3_protocol(), _meta_action(), a1, a2])

    before = sorted((r.k, r.p) for r in
                    DeltaLiteTable(spark, tdir).read().collect())
    ck = checkpoint_delta_export(spark, tdir)
    assert ck["version"] == 0 and ck["actions"] >= 4
    os.remove(os.path.join(log, f"{0:020d}.json"))

    t = DeltaLiteTable(spark, tdir)
    after = sorted((r.k, r.p) for r in t.read().collect())
    assert after == before
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 4, 10, 11,
                                                       12, 13, 14]
    assert {r.p for r in t.read().collect()} == {1, 2}


# -------------------------- property: spec reconciliation equivalence


def test_snapshot_matches_spec_reconciler_property(tmp_path):
    """Property (ADVICE r7): over random legal commit histories
    (adds, removals, DV updates in either line order, plus stale
    removes carrying outdated dv ids), snapshot()'s live set equals
    the strict spec model keyed by (path, dv uniqueId). Pure log
    replay — no Spark session touched (no checkpoints written)."""
    import random as _random

    from forklift_spark.connections.deltalite import dv_unique_id

    for seed in range(40):
        rng = _random.Random(seed)
        tdir = str(tmp_path / f"h{seed}")
        log = os.path.join(tdir, "_delta_log")
        os.makedirs(log)
        paths = [f"f{i}.parquet" for i in range(5)]
        live: dict[str, dict | None] = {}     # model: path -> dv or None
        dvn = 0
        commits: list[list[dict]] = [[_meta_action(partition_cols=())]]
        for _ in range(rng.randrange(3, 12)):
            actions: list[dict] = []
            op = rng.random()
            dead = [p for p in paths if p not in live]
            if op < 0.35 and dead:                      # add new file
                p = rng.choice(dead)
                actions.append(_add(p, {}))
                live[p] = None
            elif op < 0.65 and live:                    # dv update
                p = rng.choice(sorted(live))
                old = live[p]
                dvn += 1
                new = {"storageType": "i", "pathOrInlineDv": f"x{dvn}",
                       "offset": None, "sizeInBytes": 1, "cardinality": 1}
                a = _add(p, {})
                a["add"]["deletionVector"] = new
                r = {"remove": {"path": p, "deletionTimestamp": 1,
                                "dataChange": True}}
                if old:
                    r["remove"]["deletionVector"] = old
                pair = [a, r]
                rng.shuffle(pair)                        # either order
                actions.extend(pair)
                live[p] = new
            elif op < 0.85 and live:                    # remove file
                p = rng.choice(sorted(live))
                r = {"remove": {"path": p, "deletionTimestamp": 1,
                                "dataChange": True}}
                if live[p]:
                    r["remove"]["deletionVector"] = live[p]
                actions.append(r)
                del live[p]
            else:                                        # stale remove
                p = rng.choice(paths)
                dvn += 1
                r = {"remove": {"path": p, "deletionTimestamp": 1,
                                "dataChange": True,
                                "deletionVector": {
                                    "storageType": "i",
                                    "pathOrInlineDv": f"stale{dvn}",
                                    "offset": None, "sizeInBytes": 1,
                                    "cardinality": 1}}}
                actions.append(r)                        # must be a no-op
            if actions:
                commits.append(actions)
        for v, acts in enumerate(commits):
            _commit(log, v, acts)
        snap = DeltaLiteTable(None, tdir).snapshot()
        got = {(p, dv_unique_id(e.get("dv")))
               for p, e in snap["files"].items()}
        want = {(p, dv_unique_id(dv)) for p, dv in live.items()}
        assert got == want, f"seed {seed}: {got} != {want}"
