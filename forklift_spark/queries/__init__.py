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
# r9 rotation (same staleness policy as r8, which closed the r2 gap):
# after the r8 window ran, the stalest rows are the 10 remaining r2
# rows (the etl function batteries + relational set ops the r8 window
# evicted) and the 41 r3 rows. This window holds all 10 r2 rows, 32 of
# the r3 rows (the 9 bumped — q_json_extract / q_array_agg /
# q_data_expectations / q_ivm_agg / q_dedup_recall_eval / q_ndcg_eval /
# q_ann_ivf_topk / q_skyline / q_bpe_train — are equally-stale
# candidates whose families keep other window representatives), and 8
# rows THIS optimization round's commit-path changes ride
# (q_manifest_cdc_sync, q_mv_refresh_cdc, q_manifest_changes,
# q_merge_dv, q_scd2_merge, q_cdc_apply, q_stream_cms_build,
# q_manifest_stream_source — last driver-checked r4-r7): an
# optimization round's window should let the driver independently
# re-verify the operators whose internals changed. Every window row is
# oracle-backed (the r1/r8-checked rows-only sketch q_distinct_approx
# rotates out), and all 12 families are represented.
_WINDOW_ROWS_ONLY: frozenset[str] = frozenset()
_WINDOW_FAMILIES: dict[str, list[str]] = {
    "analytics": [
        "q_distinct_exact", "q_set_ops", "q_pivot",
        "q5_region_revenue", "q7_volume_shipping",
    ],
    "etl": [
        "q_string_funcs", "q_date_funcs", "q_union_consolidate",
        "q_conditional_agg", "q_string_agg", "q_regex_funcs",
        "q_unpivot", "q_read_since", "q_upsert_merge",
        "q_schema_evolution", "q_manifest_cdc_sync", "q_mv_refresh_cdc",
        "q_manifest_changes", "q_merge_dv", "q_scd2_merge",
        "q_cdc_apply",
    ],
    "similarity": [
        "q_ann_lsh_topk", "q_embedding_dedup_lsh", "q_semantic_dedup",
    ],
    "dedup": [
        "q_dedup_minhash_lsh", "q_substring_dedup",
        "q_set_similarity_join", "q_stream_dedup_exact",
    ],
    "timeseries": [
        "q_stream_stateful_counts", "q_stream_late_audit",
        "q_cusum_changepoint", "q_manifest_stream_source",
    ],
    "multimodal": ["q_phash_dedup", "q_scene_detect"],
    "selection": ["q_bigram_xent"],
    "text": [
        "q_text_token_stats", "q_lang_id", "q_sequence_pack",
        "q_winnow_fingerprint",
    ],
    "connectors": [
        "q_jdbc_roundtrip", "q_dump_pipe_roundtrip", "q_optimistic_sync",
    ],
    "stats": [
        "q_kmv_distinct", "q_welch_ab", "q_psi_drift",
        "q_stream_cms_build",
    ],
    "graph": ["q_pagerank", "q_triangle_count"],
    "web": ["q_url_dedup", "q_web_pipeline"],
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
