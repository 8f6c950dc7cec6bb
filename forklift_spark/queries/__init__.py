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
# r8 rotation (VERDICT r7 item 4 — freshness): the r7 window CLOSED the
# catalog (285/285 cumulative, pinned by tests/test_catalog_window.py),
# so the metric is now staleness. This window holds the 50 rows whose
# LAST driver check is oldest: the single r1 row (q_distinct_approx,
# rows-only by design — an approx-distinct sketch with no exact DuckDB
# oracle; error floor asserted in-query), ALL 34 r2 rows (the TPC-H/
# relational-surface core plus the etl function batteries), and 15 r3
# rows chosen for family spread (similarity/dedup/timeseries/text/
# selection/multimodal/connectors/stats), minus slots swapped for the
# round's NEW rows (q_delta_checkpoint_read, q_iceberg_expire_read,
# q_delta_colmap_read, q_delta_v2_checkpoint_read,
# q_delta_typewiden_read, q_delta_cdf_read, q_delta_stats_prune_read,
# q_iceberg_bounds_prune_read, q_iceberg_changelog_read,
# q_delta_changelog_read, q_iceberg_hidden_partition_read,
# q_delta_stream_source, q_iceberg_stream_source,
# q_lakehouse_files_audit, q_delta_cdf_publish, q_iceberg_refs_read —
# never driver-checked, and the window test requires never-checked ⊆
# window; the evicted rows q_dedup_recall_eval / q_bpe_train /
# q_ann_lsh_topk / q_dedup_minhash_lsh / q_distinct_exact /
# q_string_agg / q_string_funcs / q_regex_funcs / q_date_funcs /
# q_unpivot / q_conditional_agg / q_union_consolidate / q_set_ops /
# q_pivot were equally-stale candidates whose families keep other
# window representatives). After this window runs, the cumulative staleness
# median drops to two rounds — the floor for a 50-slot window.
_WINDOW_ROWS_ONLY: frozenset[str] = frozenset({
    "q_distinct_approx",
})
_WINDOW_FAMILIES: dict[str, list[str]] = {
    "analytics": [
        "q_distinct_approx", "q10_returned_items",
        "q13_order_distribution", "q14_promo_revenue", "q17_small_qty",
        "q19_disjunctive", "q22_global_sales_opp", "q4_exists_priority",
        "q9_product_profit", "q_cube",
        "q_grouping_sets", "q_percentiles", "q_rank_functions",
        "q_rfm_segments", "q_running_window",
        "q_value_window_functions",
    ],
    "etl": [
        "q_array_funcs",
        "q_groupby_histogram", "q_hwm", "q_incremental_delta",
        "q_incremental_rollup", "q_integrity_audit",
        "q_outer_join_reconcile", "q_profile_table",
        "q_salted_join",
    ],
    "similarity": ["q_ann_bruteforce_topk"],
    "dedup": [
        "q_decontaminate",
    ],
    "timeseries": ["q_asof_join", "q_delta_stream_source",
                   "q_iceberg_stream_source"],
    "multimodal": ["q_audio_features"],
    "selection": ["q_dsir_weights"],
    "text": ["q_gopher_quality"],
    "connectors": [
        "q_csv_roundtrip", "q_es_roundtrip",
        "q_delta_checkpoint_read", "q_iceberg_expire_read",
        "q_delta_colmap_read", "q_delta_v2_checkpoint_read",
        "q_delta_typewiden_read", "q_delta_cdf_read",
        "q_delta_stats_prune_read", "q_iceberg_bounds_prune_read",
        "q_iceberg_changelog_read", "q_delta_changelog_read",
        "q_iceberg_hidden_partition_read", "q_lakehouse_files_audit",
        "q_delta_cdf_publish", "q_iceberg_refs_read",
    ],
    "stats": ["q_heavy_hitters_cms"],
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
