#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, 20 slowest only}, "queries_truncated": bool,
"n_queries": N, "sf": ..., "artifact": path}. The COMPLETE per-query
map + per-query dispersion live in the artifact file (stdout is kept
under the driver's 2000-char tail capture).

Each query is forced with a count() action (full plan execution, no
driver materialization of rows). A warmup pass on sf0.001 JIT-warms the
JVM before timing. The sweep is SELF-VERIFYING: per-query outliers
(>3x the previous artifact or >3x internal repeat spread) are
re-measured in a fresh subprocess and substituted, marked
``contaminated_in_sweep`` (in-sweep contamination is tail-shaped;
see GUIDE.md 'Bench artifact history').
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from forklift_spark import queries as Q  # noqa: E402
from forklift_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"

# Headline set: scan/agg, join-heavy, window, dedup, similarity, text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q4_exists_priority",
    "q10_returned_items",
    "q14_promo_revenue",
    "q17_small_qty",
    "q19_disjunctive",
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_order_distribution",
    "q22_global_sales_opp",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q11_important_stock",
    "q12_late_shipping",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q18_large_orders",
    "q20_excess_stock",
    "q21_waiting_supplier",
    "q_cube",
    "q_grouping_sets",
    "q_running_window",
    "q_percentiles",
    "q_rank_functions",
    "q_outer_join_reconcile",
    "q_salted_join",
    "q_topk_per_group",
    "q_rollup",
    "q_distinct_exact",
    "q_pivot",
    "q_semi_join",
    "q_window_tumbling",
    "q_sessionize",
    "q_asof_join",
    "q_asof_nearest",
    "q_event_funnel",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_components",
    "q_ann_bruteforce_topk",
    "q_ann_lsh_topk",
    "q_embedding_dedup_lsh",
    "q_text_quality",
    "q_lang_id",
    "q_zipf_token_freq",
    "q_lexical_diversity",
    "q_repetition_quality",
    "q_sequence_pack",
    "q_tfidf_top_terms",
    "q_stratified_sample",
    "q_gap_fill",
    "q_incremental_rollup",
    "q_ohlc_bars",
    "q_grouped_ols",
    "q_stats_moments",
    "q_zscore_outliers",
    "q_time_weighted_avg",
    "q_equiwidth_histogram",
    "q_embedding_quantize",
    "q_winsorize",
    "q_rolling_anomaly",
    "q_event_debounce",
    "q_fuzzy_match",
    "q_integrity_audit",
    "q_token_rarity",
    "q_media_metadata",
    "q_frame_sample",
    "q_audio_features",
    "q_image_headers",
    "q_corpus_curation",
    "q_skew_audit",
    "q_substring_dedup",
    "q_semantic_dedup",
    "q_gopher_quality",
    "q_inverted_index",
    "q_temperature_mix",
    "q_image_decode",
    "q_video_frames",
    "q_url_dedup",
    "q_domain_stats",
    "q_html_strip",
    "q_heavy_hitters_cms",
    "q_pagerank",
    "q_winnow_fingerprint",
    "q_winnow_pairs",
    "q_bloom_decontaminate",
    "q_range_join",
    "q_video_thumbnail",
    "q_domain_authority",
    "q_scd2_merge",
    "q_cdc_apply",
    "q_stream_sessionize",
    "q_stream_cms_build",
    "q_bpe_pair_stats",
    "q_equidepth_histogram",
    "q_hll_portable",
    "q_zorder_keys",
    "q_dsir_weights",
    "q_unigram_xent",
    "q_quantile_sketch",
    "q_subword_encode",
    "q_grouped_quantiles",
    "q_table_checksum",
    "q_stream_qsketch",
    "q_k_anonymity",
    "q_bm25_search",
    "q_global_shuffle",
    "q_warc_extract",
    "q_ivm_join",
    "q_time_travel",
    "q_set_similarity_join",
    "q_triangle_count",
    "q_interval_merge",
    "q_decayed_engagement",
    "q_data_expectations",
    "q_l_diversity",
    "q_kmv_distinct",
    "q_stream_dedup_exact",
    "q_mmr_diversify",
    "q_rrf_fusion",
    "q_entity_resolution",
    "q_snapshot_diff",
    "q_welch_ab",
    "q_psi_drift",
    "q_bigram_xent",
    "q_bom_explode",
    "q_bfs_hops",
    "q_ivm_agg",
    "q_phash_dedup",
    "q_scene_detect",
    "q_line_dedup",
    "q_kcore",
    "q_random_walks",
    "q_stream_late_audit",
    "q_attribution",
    "q_join_size_est",
    "q_ann_recall",
    "q_mi_feature_select",
    "q_balanced_sample",
    "q_web_pipeline",
    "q_spatial_join",
    "q_ewma_smooth",
    "q_dataset_card",
    "q_pseudonymize",
    "q_sequence_pattern",
    "q_stream_enrich",
    "q_fk_discovery",
    "q_audio_fingerprint",
    "q_fd_discovery",
    "q_k_anonymize",
    "q_skyline",
    "q_sliding_distinct",
    "q_zone_map_pruning",
    "q_cusum_changepoint",
    "q_compaction_plan",
    "q_bpe_train",
    "q_link_predict",
    "q_quantile_normalize",
    "q_modularity",
    "q_ndcg_eval",
    "q_json_schema_infer",
    "q_dedup_recall_eval",
    "q_containment_dedup",
    "q_seasonal_decompose",
    "q_bitemporal",
    "q_dp_release",
    "q_process_mining",
    "q_holt_forecast",
    "q_critical_path",
    "q_merge_partitioned",
    "q_manifest_compact",
    "q_manifest_skipping",
    "q_stream_merge_manifest",
    "q_merge_dv",
    "q_manifest_changes",
    "q_mv_refresh_cdc",
    "q_manifest_bucket_merge",
    "q_manifest_bloom_lookup",
    "q_cohort_retention",
    "q_rfm_segment_sizes",
    "q_basket_rules",
    "q_vocab_kl",
    "q_label_propagation",
    "q_benford_audit",
    "q_mixture_weights",
    # r5 wave: manifest metadata segments, SQL/time-travel surface,
    # live-postgres wire round trip
    "q_manifest_checkpoint",
    "q_manifest_sql",
    "q_manifest_segment_skip",
    "q_manifest_time_travel",
    "q_manifest_cdc_sync",
    "q_pg_roundtrip",
    # r6 wave: merge-key pruning (zones + blooms), one-commit CDC apply,
    # pg COPY bulk path, lossless edit-distance self-join, ExactSubstr
    "q_manifest_key_prune",
    "q_manifest_bloom_prune",
    "q_apply_changes",
    "q_pg_copy_roundtrip",
    "q_passjoin_pairs",
    "q_exact_substr_dedup",
    "q_delta_read",
    "q_avro_roundtrip",
    # r7 wave: deletion-vector read interop, incremental lakehouse sync
    "q_delta_dv_read",
    "q_delta_sync",
    "q_iceberg_read",
    "q_iceberg_changes",
    "q_manifest_stream_source",
    # r8 wave: bounded-replay checkpoint read, snapshot-expiry read,
    # column-mapping + v2-spec-checkpoint interop reads
    "q_delta_checkpoint_read",
    "q_iceberg_expire_read",
    "q_delta_colmap_read",
    "q_delta_v2_checkpoint_read",
    # r8 wave 2: mixed-generation type-widening read, change data feed,
    # stats-based file skipping
    "q_delta_typewiden_read",
    "q_delta_cdf_read",
    "q_delta_stats_prune_read",
    "q_iceberg_bounds_prune_read",
    # r8 wave 3: row-level snapshot/version-diff changelogs with deletes
    "q_iceberg_changelog_read",
    "q_delta_changelog_read",
    # r8 wave 4: hidden-partition-transform pruning + delta stream source
    "q_iceberg_hidden_partition_read",
    "q_delta_stream_source",
    "q_iceberg_stream_source",
    "q_lakehouse_files_audit",
    "q_delta_cdf_publish",
    "q_iceberg_refs_read",
]


# Self-verifying sweep (VERDICT r7 item 1): in-sweep contamination is
# TAIL-shaped (a handful of queries 8-25x slower than their isolated
# steady state while the median stays flat), so the 1.2x median drift
# guard alone cannot catch it. Any common query whose in-sweep number
# exceeds OUTLIER_RATIO x its previous record — or whose own repeats
# disagree by that factor — is re-measured in a FRESH subprocess and the
# isolated number is substituted, marked contaminated_in_sweep.
OUTLIER_RATIO = 3.0
_OUTLIER_FLOOR_SEC = 2.0  # ignore sub-2s wobble: ratios on tiny queries
# are ambient noise, not contamination


def flag_outliers(
    timings: dict[str, float],
    dispersion: dict[str, dict],
    prev_queries: dict[str, float] | None,
) -> list[str]:
    """Queries whose in-sweep number cannot be trusted: >OUTLIER_RATIO x
    the previous artifact's record (cross-run signal), or an
    >OUTLIER_RATIO x spread between this sweep's own repeats (intra-run
    signal — r7's q_containment_dedup ran [45.0, 1.6] in-sweep)."""
    flagged = []
    for n, t in timings.items():
        prev = (prev_queries or {}).get(n)
        if (
            prev
            and prev > 0
            and t / prev > OUTLIER_RATIO
            and t - prev > _OUTLIER_FLOOR_SEC
        ):
            flagged.append(n)
            continue
        # intra-run signal over the STEADY-STATE runs only: run 1 pays
        # per-plan codegen/JIT by design (the scalar already excludes
        # it), so including it here just manufactures flags — measured
        # in the first r8 sweep: 10 of 11 flags were run-1-shaped and
        # the isolated re-measure reproduced the same run-1 spike
        runs = ((dispersion.get(n) or {}).get("runs") or [])[1:]
        if (
            len(runs) > 1
            and min(runs) > 0
            and max(runs) / min(runs) > OUTLIER_RATIO
            and max(runs) - min(runs) > _OUTLIER_FLOOR_SEC
        ):
            flagged.append(n)
    return flagged


def isolated_measure(name: str, repeat: int = 3) -> dict | None:
    """Re-measure one query in a FRESH python/JVM subprocess (warmup at
    sf0.001 + ``repeat`` runs at $SPARK_GRAFT_SF_DIR; scalar = median of
    the steady-state runs). Returns {"runs": [...], "scalar": s} or
    None if the child failed."""
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_OUT"] = ""  # never clobber the artifact
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--isolated", name, "--repeat", str(repeat)],
            capture_output=True, text=True, timeout=1800, env=env,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    for line in reversed(res.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("query") == name and "scalar" in d:
            return d
    return None


_MAX_REMEASURE = 16  # each fresh-subprocess re-measure costs a JVM
# start (~40-90s); a badly contaminated box could flag dozens — bound
# the added wall time, re-measuring the WORST offenders first and
# marking the rest flagged_not_remeasured (numbers kept, honesty kept)


def self_verify(
    timings: dict[str, float],
    dispersion: dict[str, dict],
    prev_queries: dict[str, float] | None,
    measure=isolated_measure,
) -> list[str]:
    """Flag outliers and substitute a fresh-subprocess re-measure for
    each (mutates timings/dispersion in place). Returns the names that
    were re-measured and substituted."""
    substituted = []
    flagged = flag_outliers(timings, dispersion, prev_queries)
    if len(flagged) > _MAX_REMEASURE:
        def _severity(n: str) -> float:
            prev = (prev_queries or {}).get(n) or 0.0
            cross = timings[n] / prev if prev > 0 else 0.0
            runs = ((dispersion.get(n) or {}).get("runs") or [])[1:]
            intra = max(runs) / min(runs) if len(runs) > 1 and min(runs) \
                else 0.0
            return max(cross, intra)

        flagged.sort(key=_severity, reverse=True)
        for name in flagged[_MAX_REMEASURE:]:
            dispersion.setdefault(name, {})["flagged_not_remeasured"] = True
        print(f"bench: {len(flagged)} outliers flagged; re-measuring the "
              f"{_MAX_REMEASURE} worst (others marked "
              f"flagged_not_remeasured)", file=sys.stderr)
        flagged = flagged[:_MAX_REMEASURE]
    for name in flagged:
        iso = measure(name)
        if not iso:
            print(f"bench: outlier {name} flagged but isolated "
                  f"re-measure FAILED — keeping the in-sweep number",
                  file=sys.stderr)
            continue
        d = dispersion.setdefault(name, {})
        d["contaminated_in_sweep"] = True
        d["in_sweep"] = timings[name]
        d["isolated_runs"] = [round(r, 4) for r in iso["runs"]]
        timings[name] = round(float(iso["scalar"]), 4)
        substituted.append(name)
        print(f"bench: {name} in-sweep {d['in_sweep']}s flagged as "
              f"contaminated; substituted isolated {timings[name]}s "
              f"(runs {d['isolated_runs']})", file=sys.stderr)
    return substituted


def run_isolated(name: str, repeat: int) -> None:
    """Child mode for isolated_measure: fresh session, one query."""
    import statistics

    from forklift_spark import queries as Q
    from forklift_spark.session import get_spark

    spark = get_spark(app_name=f"forklift_spark_bench_iso_{name}")
    catalog = Q.catalog()
    if name not in catalog:
        print(json.dumps({"query": name, "error": "unknown"}))
        return
    try:
        catalog[name](spark, WARMUP_DIR).count()
    except Exception:
        pass
    runs = []
    for _ in range(max(2, repeat)):
        t0 = time.perf_counter()
        catalog[name](spark, SF_DIR).count()
        runs.append(round(time.perf_counter() - t0, 4))
    print(json.dumps({
        "query": name, "runs": runs,
        "scalar": round(statistics.median(runs[1:]), 4),
    }))


def write_artifact(artifact: str, art: dict, force: bool = False) -> bool:
    """Atomically write the bench artifact — UNLESS it would replace an
    existing run with one whose common-query median ratio drifts >1.2x
    (ambient-drift refusal, VERDICT r6 item 2: r6 committed a 462 s
    noisy-machine run over the 230 s run its NOTES describe; ambient
    bands of 1.4-5x swamp real signals). The rejected run is parked at
    ``<artifact>.drift-rejected.json`` so the numbers are never lost.
    Returns True if the artifact was replaced."""
    import statistics

    timings = art["queries"]
    if os.path.exists(artifact) and not force:
        try:
            with open(artifact) as fh:
                prev = json.load(fh)
            common = [
                n for n in timings
                if n in prev.get("queries", {}) and prev["queries"][n] > 0
            ]
            if len(common) >= 10:
                ratio = statistics.median(
                    timings[n] / prev["queries"][n] for n in common
                )
                if ratio > 1.2:
                    rej = artifact + ".drift-rejected.json"
                    with open(rej + ".tmp", "w") as fh:
                        json.dump(art, fh, indent=1, sort_keys=True)
                        fh.write("\n")
                    os.replace(rej + ".tmp", rej)
                    print(
                        f"bench: REFUSING artifact refresh — median ratio "
                        f"{ratio:.2f}x over {len(common)} common queries vs "
                        f"{artifact} exceeds 1.2x (ambient drift guard); "
                        f"run parked at {rej}. Set SPARK_GRAFT_BENCH_FORCE=1 "
                        f"to accept.",
                        file=sys.stderr,
                    )
                    return False
        except (json.JSONDecodeError, OSError):
            pass  # unreadable previous artifact: replace it
    tmp = artifact + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, artifact)
    return True


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    if "--isolated" in sys.argv:
        rep = 3
        if "--repeat" in sys.argv:
            rep = int(sys.argv[sys.argv.index("--repeat") + 1])
        run_isolated(sys.argv[sys.argv.index("--isolated") + 1], rep)
        return
    spark = get_spark(app_name="forklift_spark_bench")
    catalog = Q.catalog()
    names = [n for n in HEADLINE if n in catalog]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in catalog]

    for name in names:  # warmup at tiny SF
        try:
            catalog[name](spark, WARMUP_DIR).count()
        except Exception:
            pass

    # Repeats at the target SF: the first run pays per-plan codegen
    # compilation + JIT; with 2 repeats the scalar is the min (the
    # steady-state the engine sustains — historical best-of-2 protocol);
    # with >=3 repeats it is the MEDIAN of runs 2..N (first run is
    # treated as warmup), which is robust to one-off ambient spikes —
    # VERDICT r6 item 2: single-shot artifacts could not distinguish a
    # real regression from machine weather (ambient bands measured
    # 1.4-5x per query on this box).
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    repeat = max(1, repeat)
    import gc
    import statistics

    timings: dict[str, float] = {}
    dispersion: dict[str, dict[str, float]] = {}
    for qi, name in enumerate(names):
        runs: list[float] = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            catalog[name](spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        steady = runs[1:] if len(runs) > 1 else runs
        scalar = min(steady) if repeat < 3 else statistics.median(steady)
        timings[name] = round(scalar, 4)
        dispersion[name] = {
            "min": round(min(runs), 4),
            "med": round(statistics.median(runs), 4),
            "max": round(max(runs), 4),
            "runs": [round(r, 4) for r in runs],
        }
        # inter-query hygiene (NOT inside the timed window): drop Python
        # references so py4j releases JVM handles, and clear blocks a
        # query pinned for itself (localCheckpoint/persist). Without
        # this, leakage accumulates over ~190 queries and the tail of
        # the suite reads 1.3-2x slower than the same queries run fresh
        # — measured r5; it made round-over-round diffs unusable.
        gc.collect()
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        # r7: clearCache() misses localCheckpoint RDD blocks (they are
        # not SQL-cache entries); at --repeat 3 the extra executions
        # pinned enough block memory that heavy manifest/stream queries
        # read 1.5-6x slower in-sweep than isolated (q_ann_lsh_topk
        # 16.2s in-sweep vs 2.6s isolated, measured) while the 22
        # byte-untouched TPC-H shapes stayed at 0.98x — unpersist every
        # persistent RDD the JVM still tracks.
        try:
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
        except Exception:
            pass
        # r8 insurance (not a reproduced-bug fix — three probes could
        # not reproduce the driver-r7 contamination in-process): Spark's
        # ContextCleaner frees broadcasts / shuffle state / shuffle
        # FILES only when the JVM GC collects their weak references,
        # and Python-side gc.collect() never triggers a JVM GC — over
        # 600+ query executions the uncollected registry and on-disk
        # shuffle files only grow. One System.gc() every 25 queries is
        # ~100ms amortized and bounds both.
        if qi % 25 == 24:
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass

    # Self-verify BEFORE publishing any number (VERDICT r7 item 1):
    # flag tail outliers vs the previous artifact and this sweep's own
    # repeat spread, re-measure each in a fresh subprocess, substitute.
    artifact = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL_r9.json")
    prev_queries: dict[str, float] | None = None
    prev_path = artifact if artifact and os.path.exists(artifact) else None
    if prev_path is None and artifact:
        # first run of a round: flag against the NEWEST prior-round
        # artifact instead of nothing (its per-query records are the
        # only cross-run signal available; contaminated rows in it only
        # make flagging more conservative, never less)
        import glob as _glob

        cands = sorted(_glob.glob("BENCH_LOCAL_r*.json"))
        prev_path = cands[-1] if cands else None
    if prev_path:
        try:
            with open(prev_path) as fh:
                prev_queries = json.load(fh).get("queries")
        except (json.JSONDecodeError, OSError):
            prev_queries = None
    substituted = []
    if not extra and not os.environ.get("SPARK_GRAFT_BENCH_NO_VERIFY"):
        substituted = self_verify(timings, dispersion, prev_queries)

    # stdout stays SMALL (VERDICT r7 item 7: the driver captures only a
    # 2000-char tail, and the full 200-query map outgrew it in r4 —
    # BENCH_r0N.json "parsed": null ever since). The scalar summary +
    # the 20 slowest queries fit; the COMPLETE per-query map and
    # dispersion live in the committed artifact file.
    slowest = dict(sorted(
        timings.items(), key=lambda kv: kv[1], reverse=True)[:20])
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": {n: timings[n] for n in sorted(slowest)},
        "queries_truncated": len(timings) > len(slowest),
        "n_queries": len(timings),
        "sf": _sf_from_dir(SF_DIR),
        "artifact": artifact or None,
    }
    print(json.dumps(out))
    # The full per-query timings go to a committed artifact: the
    # driver's BENCH_r{N}.json stores only a stdout tail, which
    # truncated the TPC-H numbers out of r3/r4 round-over-round diffs
    # (VERDICT r4 item 4). Only full-headline runs write it (subset runs
    # during iteration would clobber the committed numbers); atomic
    # write; disable with an empty env value.
    if artifact and not extra:
        art = dict(out)
        art["queries"] = timings
        del art["queries_truncated"]
        art["repeat"] = repeat
        art["dispersion"] = dispersion
        art["contaminated_in_sweep"] = sorted(substituted)
        write_artifact(
            artifact, art, force=bool(os.environ.get("SPARK_GRAFT_BENCH_FORCE"))
        )


if __name__ == "__main__":
    main()
