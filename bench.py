"""Benchmark harness — times the headline catalog queries.

Runs every query tagged as headline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full compute, no collect,
no disk write). Every query first runs once untimed — warming the JVM,
file-listing caches, and the per-plan whole-stage-codegen (Janino)
compilation — then the timed pass measures steady-state execution, which
is the number that scales with data volume (compile cost is a per-plan
constant that vanishes at 100 TB; measuring it would grade the Janino
compiler, not the engine).

After the headline phases, every OTHER registered catalog query is timed
once, cold (no warm pass) into BENCH_DETAIL.json's "tail_queries" — a
family-level regression radar (compare round over round at >2×), not a
headline number. SPARK_GRAFT_BENCH_FULL=0 skips the tail sweep.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.session import get_spark

# Heavier / representative queries; cheap scalar probes excluded.
HEADLINE = [
    "q1_pricing_summary",
    "top_revenue_customers",
    "running_total_window",
    "d1_dedup_first_seen",
    "d2_merge_upsert",
    "events_per_day",
    "p1_salary_extract",
    "p5_technologies",
    "posts_pipeline_e2e",
    "json_props_extract",
    "streaming_window_counts",
    "minhash_lsh_near_dup",
    "ann_cosine_topk",
    "text_stats",
    "dq_validation_suite",
    "rfm_segmentation",
    "heavy_hitter_tokens",
    "funnel_sequence_match",
    "jaccard_prefix_filter_join",
    "bfs_supplier_reachability",
    "pagerank_suppliers",
    "triangle_counts_parts",
    "kmeans_lloyd_clusters",
    "ivf_trained_ann_topk",
    "spatial_radius_join",
    "capped_running_balance",
    "streaming_interval_join",
    "multimodal_frame_sample",
]

# Added round 7 (the round-5/6/7 operator families, previously
# untracked round-over-round). Kept separate so the legacy 28-query
# total stays comparable across BENCH_r*.json: "value" sums ALL
# queries; "value_legacy28" sums only LEGACY (= r1-r6 headline set).
ADDED_R7 = [
    "canonical_url_dedup",
    "corpus_mixture_waterfill",
    "personalized_pagerank_suppliers_scale",
    "streaming_incremental_dedup",
    "domain_quota_cap",
    "semantic_dedup_clusters",
    "repeated_ngram_coverage",
    "duplicate_span_clip",
    "dsir_importance_weights",
    "epoch_shuffle_shards",
    "cluster_safe_splits",
    "bigram_backoff_logprob",
    "langid_trigram_rank",
    "curriculum_quality_order",
    "soft_dedup_weights",
    "temperature_mixture_weights",
    "tokenizer_fertility_by_lang",
    "mixture_realized_upsample",
    "mixture_epoch_export_e2e",
    "annealed_mixture_schedule",
    "combined_dedup_clusters",
    "quality_threshold_sweep",
    "bm25_doc_ranking",
    "rrf_multi_query_fusion",
]
# Added late round 7: the drift / sketch / containment / contrastive /
# privacy families. Same bridge rule — "value" sums everything,
# "value_legacy28" stays the r1-r6 set.
ADDED_R7B = [
    "corpus_snapshot_psi",
    "source_token_divergence",
    "streaming_drift_psi",
    "subdocument_containment",
    "ann_int8_topk",
    "hard_negative_mining",
    "triplet_mining",
    "bbit_minhash_estimate",
    "cms_heavy_hitters",
    "streaming_cms_ingest",
    "k_anonymity_report",
    "embedding_label_outliers",
    "embedding_centroid_drift",
    "histogram_quantile_sketch",
    "bloom_decontamination",
    "record_linkage_scored",
]
# Added round 8: the structural-hygiene / classifier / sketch-store /
# tokenizer-induction families.
ADDED_R8 = [
    "boilerplate_line_removal",
    "paragraph_dedup_exact",
    "corpus_hygiene_e2e",
    "quality_classifier_score",
    "quality_classifier_train_filter",
    "hll_distinct_sketch",
    "streaming_hll_ingest",
    "bpe_merge_rules",
    "length_bucket_batching",
    "orc_roundtrip_agg",
    "jsonl_roundtrip_fidelity",
    "bpe_encode_compression",
    "ann_pq_topk",
    "embedding_pca_power",
    "streaming_boilerplate_ingest",
    "mmr_diverse_topk",
]
# Added round 9: the persisted-index ANN probe path + incremental
# index maintenance (frozen-quantizer/codebook appends).
ADDED_R9 = [
    "ann_pq_index_topk",
    "ann_pq_index_append",
    "ivf_index_append_probe",
    "ann_ivfpq_topk",
    "ann_ivfpq_index_topk",
    "ann_ivfpq_index_append",
]
# Added round 10: control charts / rank tests / graph communities /
# SRP-LSH / layout audit — one representative per new family.
ADDED_R10 = [
    "gopher_rules_filter",
    "word_entropy_ttr",
    "cusum_changepoint",
    "ewma_window_smoothing",
    "kcore_parts",
    "label_propagation_communities",
    "srp_lsh_ann_topk",
    "zorder_layout_audit",
    "bootstrap_mean_ci",
]
# Added round 11: the persisted SRP index family + the stats/time-series
# batch (one representative per family).
ADDED_R11 = [
    "ann_srp_index_topk",
    "ann_srp_index_append",
    "spearman_corr_by_type",
    "kendall_tau_daily",
    "acf_daily_revenue",
    "effect_size_click_view",
    "late_arrival_audit",
    "holt_winters_daily",
    "degree_powerlaw_fit",
    "ngram_novelty_profile",
    "audio_energy_windows",
    "q19_discounted_revenue",
    "q2_min_cost_supplier",
    "ann_hubness_audit",
    "knn_label_vote_accuracy",
    "streaming_srp_index_ingest",
    "srp_bucket_histogram",
]
# Added round 12: the multimodal near-dup family (image/audio/video +
# the survivor materialization) and the streaming trained-quantizer
# index ingests.
ADDED_R12 = [
    "image_phash_near_dup",
    "audio_fingerprint_near_dup",
    "video_framehash_near_dup",
    "image_dedup_survivors",
    "streaming_pq_index_ingest",
    "streaming_ivfpq_index_ingest",
    "streaming_image_dedup_ingest",
]
ADDED_R13 = [
    "streaming_audio_dedup_ingest",
    "streaming_video_dedup_ingest",
    "multimodal_combined_clusters",
    "multimodal_corpus_export_e2e",
    "multimodal_duplicate_census",
    "image_dedup_monochrome_flood",
    "video_shot_boundaries",
]
LEGACY = list(HEADLINE)
HEADLINE = (
    HEADLINE
    + ADDED_R7
    + ADDED_R7B
    + ADDED_R8
    + ADDED_R9
    + ADDED_R10
    + ADDED_R11
    + ADDED_R12
    + ADDED_R13
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    reg = get_registry()

    # PHASED protocol: warm + time the legacy set COMPLETELY before any
    # ADDED_R7 query runs. Measured A/B (r7): warming all 50 queries
    # before timing legacy inflated value_legacy28 from 33.9 s to
    # 42.3 s — the added families' star-contraction localCheckpoint
    # blocks (RDD storage, not CacheManager entries, so clearCache()
    # can't free them) plus broadcast/GC residue tax everything timed
    # after. Phasing keeps value_legacy28 semantics identical to the
    # r1-r6 runs (nothing but legacy's own warm-up precedes it), which
    # is what BENCH_r*.json round-over-round comparison assumes.
    timings: dict[str, float] = {}
    for group in (
        LEGACY,
        ADDED_R7,
        ADDED_R7B,
        ADDED_R8,
        ADDED_R9,
        ADDED_R10,
        ADDED_R11,
        ADDED_R12,
        ADDED_R13,
    ):
        names = [n for n in group if n in reg]

        # untimed pass: JVM + file listing + per-plan codegen compilation
        for name in names:
            materialize(reg[name].spark(spark, sf_dir))

        # Operators that .cache()/persist() internally register plans in
        # the CacheManager; without clearing, the timed pass would
        # substitute the warm-up's already-materialized InMemoryRelations
        # and under-report. Clearing between timed queries also stops
        # cache-plan reuse ACROSS queries that share sub-plans (e.g. the
        # shingle table) and bounds cached-plan memory. localCheckpoint
        # blocks can't be substituted: each pass rebuilds the DataFrame,
        # which computes fresh checkpoints, so the timed pass stays
        # honest; gc.collect() lets the ContextCleaner reap the old ones.
        spark.catalog.clearCache()
        gc.collect()

        # Best-of-2 timed passes per query, caches cleared before each,
        # so a transient external load spike on the shared host (observed
        # 4× slowdowns on otherwise-flat queries) doesn't masquerade as a
        # regression. Both passes do the full work — min is interference
        # suppression, not cache reuse.
        for name in names:
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(reg[name].spark(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            spark.catalog.clearCache()
            gc.collect()

    # Full-catalog tail: every registered query NOT in the headline set,
    # timed ONCE with no warm-up pass (the number includes per-plan
    # codegen compile — fine for its purpose: a family-level regression
    # radar across rounds, flagged at >2×, not a headline metric).
    # Disable with SPARK_GRAFT_BENCH_FULL=0.
    tail_timings: dict[str, float] = {}
    sentinel_series: list[dict[str, float]] = []
    SENTINEL = "q1_pricing_summary"  # fixed ~0.3 s plan, warmed in phase 1
    SENTINEL_EVERY = 8
    if os.environ.get("SPARK_GRAFT_BENCH_FULL", "1") != "0":
        tail = sorted(n for n in reg if n not in set(HEADLINE))
        # One untimed session-warmup (an already-warm headline plan, so
        # no tail plan loses its cold-codegen property). Best-of-2 for
        # EVERY tail entry (r11 made it first-five-only, which fixed the
        # post-headline GC/JIT settling drift on alphabetically-early
        # queries but left the rest single-pass — min-of-N systematically
        # lowers the sampled five, so round-over-round and intra-tail
        # comparisons stopped being like-for-like; r11 advisor finding).
        # r12 onward: uniform passes, recorded as "tail_passes" so future
        # methodology changes stay attributable.
        materialize(reg[SENTINEL].spark(spark, sf_dir))
        # Contention sentinel: the driver's r10/r11 tails showed 4-7×
        # drifts on UNCHANGED sub-second queries, judge-attributed to
        # shared-host load. Interleaving a fixed, warm, ~0.3 s reference
        # plan every SENTINEL_EVERY tail entries turns that noise class
        # into data: a tail reading is flagged noisy when its neighboring
        # sentinel sample also drifted (see README "Bench tail triage").
        for i, name in enumerate(tail):
            if i % SENTINEL_EVERY == 0:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(reg[SENTINEL].spark(spark, sf_dir))
                sentinel_series.append(
                    {"before_tail_index": i, "sec": round(time.perf_counter() - t0, 3)}
                )
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(reg[name].spark(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            tail_timings[name] = round(best, 3)
        spark.catalog.clearCache()
        gc.collect()

    legacy_total = round(sum(t for n, t in timings.items() if n in LEGACY), 3)
    detail = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # bridge: BENCH_r1-r6 totals covered only the legacy 28
        # queries — compare those to value_legacy28, not value
        "value_legacy28": legacy_total,
        # best-of-2 cold timings for the rest of the catalog (see above)
        "tail_queries": tail_timings,
        "tail_total_sec": round(sum(tail_timings.values()), 3),
        "tail_passes": 2,
        # fixed warm reference plan timed before every 8th tail entry —
        # the host-contention meter for tail triage (README rule)
        "sentinel": {
            "query": SENTINEL,
            "every_n_tail": SENTINEL_EVERY,
            "series": sentinel_series,
            "median_sec": (
                round(sorted(s["sec"] for s in sentinel_series)[len(sentinel_series) // 2], 3)
                if sentinel_series
                else None
            ),
        },
    }
    # Full per-query detail: an EARLY stdout line + a repo file. The
    # driver keeps only the last 2000 chars of stdout and parses the
    # final line as JSON (BENCH_r7 recorded "parsed": null because the
    # 68-query map blew past that window), so the FINAL line below is
    # kept compact — frozen legacy-28 map + totals, guaranteed to fit.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": detail["value"],
                "unit": "sec",
                "queries": {n: t for n, t in timings.items() if n in LEGACY},
                "sf": sf,
                "value_legacy28": legacy_total,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
