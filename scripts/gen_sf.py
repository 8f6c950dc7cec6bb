"""Generate a larger scale factor from the driver's sf0.1 tables by
deterministic key-shifted replication (default 10x -> "sf1").

The driver's generator (seed=42) is not shipped, so scale-stress data
is derived from its sf0.1 output: N copies of every scaling table with
all key domains offset per copy, so referential integrity, per-key
cardinalities, value distributions and planted skew are preserved while
table volume grows Nx. Fixed-cardinality dims (region, nation) stay
fixed, exactly like TPC-H scaling.

Cross-copy contamination is neutralized where it would change the
WORKLOAD SHAPE, not just its size:
- documents: every word is suffixed with the copy index, so shingle /
  MinHash / fingerprint dedup finds the same duplicate structure per
  copy instead of O(N^2) cross-copy pairs;
- embeddings: each copy applies a deterministic per-copy SIGN-FLIP
  pattern (an orthogonal diagonal transform): pairwise cosines WITHIN a
  copy are preserved exactly — the planted near-dup structure repeats
  per copy — while cross-copy cosines are sign-scrambled to ~0, so the
  pair graph is 10 disjoint copies of the sf0.1 graph, not one giant
  cross-copy component. (A first attempt used per-copy array rotation;
  smooth vectors survive rotation nearly unchanged, which chained
  copies together into a component deep enough to blow the
  pointer-doubling round budget — measured, not hypothetical.)
- events: user_id is offset per copy — per-user session/window volume
  stays constant while the user population grows Nx (the realistic
  growth axis for a stream table).

Usage: python scripts/gen_sf.py [out_dir] [n_copies]   (defaults: .scale/sf1, 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key columns to offset per copy: table -> {col: domain}
# domain constants are >= max key in sf0.1 with headroom, so copies
# never collide
_DOMS = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "suppkey": 100_000,
    "partkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "emb_id": 1_000_000,
}

_SHIFTS = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}


def _replicate(df, shifts: dict[str, str], n: int):
    copies = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__c")
    )
    for col, dom in shifts.items():
        copies = copies.withColumn(
            col, F.col(col) + F.col("__c") * F.lit(_DOMS[dom])
        )
    return copies.drop("__c")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from forklift_spark.session import get_spark
    from forklift_spark import tables

    spark = get_spark(app_name="gen_sf", shuffle_partitions=32)
    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation"):  # fixed-cardinality dims
        tables.load(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    for name, shifts in _SHIFTS.items():
        _replicate(tables.load(spark, SRC, name), shifts, n).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{name}.parquet"))

    docs = tables.load(spark, SRC, "documents")
    doc_cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    _replicate(docs, {"doc_id": "doc_id"}, n).withColumn(
        "__c", (F.col("doc_id") / _DOMS["doc_id"]).cast("long")
    ).withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w: F.concat(w, F.col("__c").cast("string")),
            ),
            " ",
        ),
    ).drop("__c").select("doc_id", "text", *doc_cols).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "documents.parquet"))

    emb = tables.load(spark, SRC, "embeddings")
    key = "emb_id" if "emb_id" in emb.columns else emb.columns[0]
    vec = next(c for c in emb.columns if c != key)
    other = [c for c in emb.columns if c not in (key, vec)]
    _replicate(emb, {key: "emb_id"}, n).withColumn(
        "__c", (F.col(key) / _DOMS["emb_id"]).cast("long")
    ).withColumn(
        vec,
        F.transform(
            F.col(vec),
            lambda x, j: F.when(
                F.pmod(F.xxhash64(F.col("__c") * F.lit(65537) + j), F.lit(2)) == 0,
                x,
            ).otherwise(-x),
        ).cast("array<float>"),
    ).drop("__c").select(key, vec, *other).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    print(f"wrote {n}x tables to {out}")


if __name__ == "__main__":
    main()
