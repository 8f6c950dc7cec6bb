"""Catalog-wide physical-plan audit: every registered query's executed
plan is checked for the join shapes that do not survive 100 TB.

- `CartesianProduct` is banned outright (the one all-pairs baseline,
  q_embedding_dedup, runs on a bounded 200-row sample and compiles to a
  broadcast nested loop, not a cartesian).
- `BroadcastNestedLoopJoin` is allowed only where the broadcast side is
  bounded by construction (1-row scalar frames, fixed query sets, the
  documented audit baselines) — listed explicitly so a new query that
  accidentally non-equi-joins two fact tables fails this test.

Plan building only analyzes (no job runs) for pure queries; entries that
execute work at build time (streams, iterative fits) are skipped here —
their plans are exercised by their own tests.
"""

from __future__ import annotations

import pytest

from forklift_spark import queries as Q
from tests.conftest import SF_DIR

# execute work at DataFrame-build time (stream run / centroid collect);
# audited by their dedicated tests instead
_BUILDS_EXECUTE = {
    "q_stream_qsketch",
    "q_time_travel",          # publishes two generations at build
    "q_stream_windowed_counts",
    "q_kmeans_clusters",
    "q_ann_ivf_topk",
    "q_ann_pq_topk",  # codebook training collects at build; bounded query-side BNLJ
    "q_ann_ivfpq_topk",  # centroid + codebook training collects at build
    "q_dedup_components",
    "q_mmr_diversify",         # greedy rounds localCheckpoint at build
    "q_entity_resolution",     # connected components iterate at build
    "q_contamination_matrix",  # shares the components/minhash machinery
    "q_incremental_rollup",    # maintains state on disk at build time
    "q_upsert_merge",
    "q_schema_evolution",
    "q_hwm",
    "q_incremental_delta",
    "q_read_since",
}

# bounded-by-construction broadcast nested loops (scalar frames, fixed
# query sets, documented audit baselines)
_BNLJ_ALLOWED = {
    "q_embedding_dedup",       # 200-row sample all-pairs audit baseline
    "q_ann_bruteforce_topk",   # fixed 10-query broadcast side (recall baseline)
    "q_knn_classify",          # built on the brute-force top-k (same bound)
    "q_hybrid_search",         # built on the brute-force top-k (same bound)
    "q_equiwidth_histogram",   # 1-row min/max bounds
    "q_equidepth_histogram",   # 1-row decile-boundary frame
    "q_zorder_keys",           # 1-row min/max bounds frame
    "q22_global_sales_opp",    # 1-row scalar average
    "q_mixture_weights",       # 1-row (total_q, total_tokens) scalar frame
    "q_benford_audit",         # 1-row grand-total scalar frame
    "q_vocab_kl",              # 1-row vocab-size + 20-row per-source totals
    "q_weighted_sample",       # 1-row max-weight normalizer
    "q_cooccurrence_lift",     # 1-row context-count normalizer
    "q_decontaminate",         # broadcast benchmark side, non-equi containment
    "q_trailing_range_window", # range-frame self join on scalar bounds
    "q_skew_audit",            # 1-row scalar table total
    "q11_important_stock",     # 1-row scalar total-value threshold
    "q15_top_supplier",        # 1-row scalar max-revenue frame
    "q_dsir_weights",          # 1-row feature-total scalars into the B-row model
    "q_unigram_xent",          # 1-row corpus-token total into the vocab model
    "q_subword_encode",        # 1-row collected-vocabulary array frame
    "q_quantile_sketch",       # pct list x bounded bucket table (rank range join)
    "q_grouped_quantiles",     # per-key totals x 3-row pct list
    "q_bm25_search",           # 1-row (N, avgdl) scalar frame
    "q_decayed_engagement",    # 1-row corpus-max-date scalar frame
    "q_bigram_xent",           # 1-row corpus-token total into the bigram model
    "q_mi_feature_select",     # 1-row (n, n_t) totals into the contingency table
    "q_k_anonymize",           # 1-row chosen-level scalar frame
    "q_kmv_distinct",          # 1-row sketch-estimate scalar frames
    "q_rrf_fusion",            # 1-row (N, avgdl) scalar + bounded query side
    "q_modularity",            # 1-row scalar edge-count frame
    "q_bpe_train",             # 1-row argmax-pair scalar frame per merge round
    "q_ndcg_eval",             # built on the brute-force top-k (same bound)
    "q_json_schema_infer",     # 1-row scalar total
    "q_dedup_recall_eval",     # three 1-row scalar metric frames
    "q_process_mining",        # 1-row scalar user-population frame
}


@pytest.mark.parametrize("name", sorted(set(Q.catalog()) - _BUILDS_EXECUTE))
def test_no_unbounded_join_shapes(name, spark):
    df = Q.catalog()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} builds a cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in _BNLJ_ALLOWED, (
            f"{name} uses BroadcastNestedLoopJoin but is not on the bounded "
            "allowlist — non-equi join between unbounded sides?"
        )
