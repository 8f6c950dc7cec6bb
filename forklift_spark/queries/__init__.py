"""Query catalog: every operator from SURVEY.md §2 (plus the large-scale
training-data operators) declared as a named (spark, sf_dir) -> DataFrame
callable with a matching DuckDB oracle SQL string.

The driver contract (__spark_entry__.py) re-exports this catalog; the
correctness gate runs each Spark query against its oracle at sf0.01 and
hash-compares values, so every query here is written for engine-exact
reproducibility (see functions.exact / functions.hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; oracle=None -> driver runs a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            # a duplicate would SILENTLY shadow the earlier query in the
            # registry (and drop it from the correctness gate) — fail at
            # import time instead
            raise ValueError(f"duplicate query name: {name!r}")
        _REGISTRY[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The correctness harness checks a PREFIX of the catalog (50 entries in
# rounds 1-2), so ordering is coverage policy. The curated window below
# holds every query family — reference-parity ETL proofs, the §2.3
# relational surface, and the full LLM-data-pipeline spread
# (dedup / similarity / text / stats / timeseries / multimodal) — and
# within it families are emitted round-robin, so ANY reasonable prefix
# (not just exactly 50) checks a representative mix. After the window:
# remaining oracle-backed queries, round-robin by family; rows-only
# queries last (weakest checks at the tail).
# r7 rotation (VERDICT r6 item 1 — CLOSE the catalog): the window holds
# ALL 32 remaining never-driver-checked queries (catalog minus the union
# of CORRECTNESS_r01..r06 keys) — the r6 wave (passjoin, exact-substr,
# merge-into, constraints, key/bloom pruning, apply_changes, time-travel,
# image headers, pg COPY, delta/iceberg interop, avro, stream source)
# plus the older deferrals (gap_fill, bitemporal, bom_explode, ...).
# Four of them (q_kmeans_clusters, q_ann_pq_topk, q_ann_ivfpq_topk,
# q_hll_user_rollup) are rows-only BY DESIGN (quantization / HLL sketches
# have no exact DuckDB oracle; recall/error floors are asserted in-query)
# — they enter the window via _WINDOW_ROWS_ONLY so the driver records
# their weaker check too, completing 283/283 cumulative coverage.
# The 18 filler slots re-verify the STALEST driver rows: the 7 queries
# last checked in round 1 (incl. q_image_features, rows-only back then,
# oracle-backed since r6) and 11 round-2 rows across analytics/etl.
_WINDOW_ROWS_ONLY: frozenset[str] = frozenset({
    "q_kmeans_clusters", "q_ann_pq_topk", "q_ann_ivfpq_topk",
    "q_hll_user_rollup",
})
_WINDOW_FAMILIES: dict[str, list[str]] = {
    "connectors": [
        "q_avro_roundtrip", "q_pg_copy_roundtrip", "q_delta_read",
        "q_delta_dv_read", "q_delta_sync", "q_iceberg_read",
        "q_iceberg_changes",
    ],
    "etl": [
        "q_merge_into", "q_manifest_constraints", "q_time_travel_ts",
        "q_apply_changes", "q_manifest_key_prune", "q_manifest_bloom_prune",
        "q_zorder_keys", "q_fd_discovery", "q_k_anonymize", "q_bitemporal",
        "q_projection_filter", "q_semi_join", "q_anti_join",
        "q_limit_sort", "q_count_min_max",
    ],
    "dedup": [
        "q_passjoin_pairs", "q_exact_substr_dedup", "q_dedup_exact",
        "q_dedup_simhash", "q_dedup_ngram_jaccard",
    ],
    "graph": ["q_bom_explode", "q_random_walks"],
    "multimodal": [
        "q_image_headers", "q_media_metadata", "q_frame_sample",
        "q_image_features",
    ],
    "similarity": [
        "q_kmeans_clusters", "q_ann_pq_topk", "q_ann_ivfpq_topk",
        "q_embedding_dedup",
    ],
    "stats": ["q_winsorize", "q_stream_cms_build", "q_hll_portable"],
    "text": ["q_doc_fingerprint", "q_top_p_selection"],
    "timeseries": [
        "q_event_funnel", "q_gap_fill", "q_hll_user_rollup",
        "q_manifest_stream_source",
    ],
    "analytics": [
        "q1_pricing_summary", "q3_shipping_priority", "q_topk_per_group",
        "q_rollup",
    ],
}


def _round_robin(queues: list[list[str]]) -> list[str]:
    out: list[str] = []
    while any(queues):
        for q in queues:
            if q:
                out.append(q.pop(0))
    return out


def _family(name: str) -> str:
    return _REGISTRY[name].__module__.rsplit(".", 1)[-1]


def catalog() -> dict[str, QueryFn]:
    _load_all()
    window = [n for q in _WINDOW_FAMILIES.values() for n in q]
    missing = [
        n for n in window
        if n not in _REGISTRY
        or (n not in _ORACLES and n not in _WINDOW_ROWS_ONLY)
    ]
    if missing:  # window names must stay oracle-backed (or explicitly
        # allowlisted rows-only); fail loud on drift
        raise RuntimeError(f"catalog window references unknown/weak queries: {missing}")
    ordered = _round_robin([list(q) for q in _WINDOW_FAMILIES.values()])
    rest_strong: dict[str, list[str]] = {}
    rest_weak: dict[str, list[str]] = {}
    for name in _REGISTRY:
        if name in ordered:
            continue
        bucket = rest_strong if name in _ORACLES else rest_weak
        bucket.setdefault(_family(name), []).append(name)
    ordered += _round_robin(list(rest_strong.values()))
    ordered += _round_robin(list(rest_weak.values()))
    return {n: _REGISTRY[n] for n in ordered}


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from forklift_spark.queries import analytics  # noqa: F401
    from forklift_spark.queries import connectors  # noqa: F401
    from forklift_spark.queries import etl  # noqa: F401
    from forklift_spark.queries import dedup  # noqa: F401
    from forklift_spark.queries import graph  # noqa: F401
    from forklift_spark.queries import multimodal  # noqa: F401
    from forklift_spark.queries import selection  # noqa: F401
    from forklift_spark.queries import similarity  # noqa: F401
    from forklift_spark.queries import stats  # noqa: F401
    from forklift_spark.queries import text  # noqa: F401
    from forklift_spark.queries import timeseries  # noqa: F401
    from forklift_spark.queries import web  # noqa: F401
    _LOADED = True
