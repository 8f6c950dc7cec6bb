"""End-to-end corpus pipeline: every stage a real training-data run
needs, composed through the PUBLIC API only — the "switch your pipeline
to this engine" proof.

ingest JSONL -> sanitize -> language ID -> near-dup dedup (MinHash ->
components -> quality-aware survivor) -> benchmark decontamination ->
PII redaction -> quality floor -> deterministic split -> day-partitioned
warehouse write -> read-back audits.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from forklift_spark.functions.clean import sanitize_overflow_chars
from forklift_spark.functions.hashing import md5_long
from forklift_spark.operators import text as X
from forklift_spark.operators.dedup import (
    contamination_pairs,
    dedup_keep_canonical,
    minhash_dedup_pairs,
)
from forklift_spark.writer import ParquetTableWriter


def test_full_corpus_pipeline(spark, tmp_path):
    base = (
        "spark shuffles data between stages whenever a wide dependency "
        "requires rows to move across partitions during execution of a plan"
    )
    bench_item = (
        "what is the capital of france the capital of france is paris "
        "a city on the seine river in western europe"
    )
    rows = [
        # near-dup pair: 2 is longer (higher quality) and must survive
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " with extra detail about partition sizes"},
        # benchmark leak: must be removed by decontamination
        {"doc_id": 3, "text": "intro text " + bench_item + " trailing text"},
        # PII carrier: must survive with the email redacted
        {"doc_id": 4, "text": "the maintainer can be reached at dev@example.com "
                              "for questions about the scheduler and the shuffle"},
        # junk (too short): fails the quality floor
        {"doc_id": 5, "text": "ok"},
        # clean keeper
        {"doc_id": 6, "text": "an unrelated document about cooking pasta with "
                              "garlic and olive oil for a family dinner on tuesday"},
    ]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps(r) for r in rows))

    # 1. ingest + sanitize
    docs = spark.read.json(str(src)).select(
        "doc_id", sanitize_overflow_chars(F.col("text")).alias("text")
    )

    # 2. language ID (all-English fixture: the gate is that it runs + tags)
    docs = docs.select("*", *X.lang_scores("text")).withColumn(
        "lang", X.predicted_lang()
    ).drop(*[f"score_{l}" for l in X.LANG_MARKERS])

    # 3. near-dup dedup, keep the highest-quality variant
    docs = docs.withColumn("quality", X.word_count("text"))
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", num_hashes=24, bands=6,
                                threshold=0.3)
    deduped = dedup_keep_canonical(docs, pairs, "doc_id", quality_col="quality")

    # 4. decontamination vs the benchmark set
    bench = spark.createDataFrame([(100, bench_item)], "doc_id long, text string")
    leaks = contamination_pairs(deduped, bench, "doc_id", "text",
                                min_containment=0.5)
    clean = deduped.join(
        leaks.select(F.col("corpus_id").alias("doc_id")).distinct(),
        "doc_id", "left_anti",
    )

    # 5. PII redaction + quality floor
    curated = clean.withColumn("text", X.redact_pii("text")).filter(
        X.word_count("text") >= 5
    )

    # 6. deterministic split + day-partitioned warehouse write
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    final = curated.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"),
    )
    wh = ParquetTableWriter(spark, str(tmp_path / "wh"))
    wh.write(final, "corpus", mode="overwrite", partition_by=["split"])

    # -- audits over the published table -----------------------------------
    out = wh.read("corpus")
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # 1 lost to 2 (quality survivor), 3 decontaminated, 5 under the floor
    assert kept == {2, 4, 6}, kept
    # the survivor of the near-dup cluster is the higher-quality variant
    assert 2 in kept and 1 not in kept
    # PII is gone but the doc survived
    t4 = out.filter(F.col("doc_id") == 4).collect()[0]["text"]
    assert "dev@example.com" not in t4 and "scheduler" in t4
    # split assignment is the deterministic hash (re-derivable)
    for r in out.collect():
        b = int(
            __import__("hashlib").md5(f"split:{r['doc_id']}".encode()).hexdigest()[:15],
            16,
        ) % 100
        expect = "train" if b < 80 else ("valid" if b < 90 else "test")
        assert r["split"] == expect
    # pipeline is idempotent: re-running from the same input matches
    wh.write(final, "corpus", mode="overwrite", partition_by=["split"])
    assert {r["doc_id"] for r in wh.read("corpus").collect()} == kept
