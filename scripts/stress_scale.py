"""Scale-up smoke: fabricate N× the sf0.1 tables in /tmp (id-shifted
unions — same distributions, bigger cardinality) and run the headline
operator families, printing per-query wall time and rows.

This is the local stand-in for the 100 TB question the bench can't ask:
do the plans hold when the data is 10× bigger than the largest driver
scale factor? Run: python scripts/stress_scale.py [multiplier]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark import registry
from streaming_ml_with_ksql_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/sgraft_stress"

# (table, id columns to shift per replica so keys stay consistent)
REPLICATE = {
    "events": {"event_id": 1_000_000, "user_id": 150},
    "customer": {"c_custkey": 1500},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1500},
    "lineitem": {"l_orderkey": 10_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}
PASSTHROUGH = ("region", "nation", "supplier", "part")

QUERIES = [
    "hopping_window_agg",
    "enriched_window_join",
    "rolling_counts",
    "asof_view_attribution",
    "pricing_summary",
    "minhash_near_dup_pairs",
    "corpus_clean_pipeline",
    "embedding_topk_bruteforce",
    # round-3 additions
    "ngram_lm_score",
    "product_profit",
    "order_count_histogram",
    "dedup_components",
    # round-5 additions
    "quantile_sketch_events",
    "value_outliers_zscore",
    "doc_hash_embed",
    "bpe_tokenize_fixed",
    "multimodal_mjpg_frame_decode",
    # round-6 additions
    "touch_attribution",
    "session_event_paths",
    "image_dhash_png",
    "term_postings_index",
    "embedding_scale_features",
    "corpus_chunk_sliding",
    "series_pattern_match",
    "corpus_rag_pipeline",
    # round-7 additions
    "roc_auc_purchase",
    "event_transition_matrix",
    "mad_outliers_values",
    "cusum_changepoints",
    "user_life_table",
    "tfidf_top_terms",
    "weighted_sample_documents",
    "key_skew_profile",
    "pagerank_near_dup",
    "copurchase_lift",
    "bigram_collocations",
    "embedding_cluster_quality",
    # round-7 continuation
    "clamped_running_balance",
    "kmeans_embedding_clusters",
    "isotonic_daily_trend",
    "bfs_hops_near_dup",
    "link_prediction_copurchase",
    "seasonal_decompose_daily",
    "multimodal_gif_decode",
    "msgpack_source_roundtrip",
    # round-7 continuation (third block)
    "twap_user_value",
    "referential_integrity_audit",
    "snapshot_diff_customers",
    "seasonal_anomaly_days",
    "bootstrap_revenue_ci",
    "dbscan_embedding_clusters",
    "holt_forecast_revenue",
    "bson_source_roundtrip",
    "user_trend_velocity",
    "thrift_source_roundtrip",
    "ngram_containment_pairs",
    "hilbert_layout",
    "session_concurrency_profile",
    "decision_stump_embedding",
    "perceptron_embedding_trajectory",
    "decision_stump_events",
    "decision_tree_depth2_events",
    "knn_loo_classification",
    "entity_golden_record",
    "quantile_sketch_accuracy",
    "cdc_join_view_maintenance",
    "label_propagation_lang",
    "multimodal_exif_metadata",
    # round-7 continuation (fourth block)
    "arrow_ipc_source_roundtrip",
    "rrf_hybrid_retrieval",
    "did_promo_effect",
    "hits_customer_part",
    "halflife_decayed_value",
    "dtw_revenue_align",
    "kmv_distinct_users",
    "jl_projection_embed",
    "mmr_diverse_retrieval",
    "rake_keyphrases",
    "fifo_lot_allocation",
    "shapley_channel_attribution",
    "t_closeness_report",
    "multimodal_mulaw_transcode",
    "conformal_forecast_interval",
    "cuped_adjusted_lift",
    "multimodal_tiff_decode",
    "compaction_bin_packing",
    "hll_estimate_accuracy",
    "naive_bayes_event_type",
    "target_encode_loo",
    "mahalanobis_order_outliers",
    "wilson_topk_parts",
    "markov_next_event_accuracy",
    "ransac_daily_trend",
    "postings_delta_varint",
    "reuse_distance_histogram",
    "degree_assortativity",
    "wire_format_gauntlet",
    "winnowing_fingerprint_pairs",
    "multimodal_hist_equalize",
    "randomization_test_weekend_value",
    "wasserstein_weekend_value",
    "latency_hdr_histogram",
    "rapid_repeat_screen",
    "ktruss_copurchase_peel",
    "streaming_wasserstein_ingest",
    # round-8 additions
    "warc_gz_source_roundtrip",
    "zip_archive_roundtrip",
    "zonemap_prune_stats",
    "ols_two_factor_revenue",
    "hard_negative_mining",
    "gbdt_stump_boost",
    "ndcg_retrieval_eval",
    "item_item_recommendations",
    # round-9 additions
    "binary_hamming_topk",
    "binary_vs_float_recall",
    "semantic_decontaminate",
    "mrr_retrieval_eval",
    "ar2_forecast_revenue",
    "gbdt_deep_boost",
    "gbdt_tree2_boost",
    "column_profile_events",
    "binary_rerank_pipeline",
    "gopher_quality_filter",
    "char_simpson_concentration",
    "contrastive_triplets",
    "textrank_keywords",
    "ece_calibration_error",
    "dedup_span_rewrite",
    "group_aware_split",
    "split_leakage_audit",
    "map_retrieval_eval",
    "incremental_near_dup_ingest",
    "join_cardinality_estimate",
    "canonical_representative_pick",
    "lang_budget_temperature",
    "frequent_triples",
    # round-10 additions
    "prf_query_expansion",
    "prf_expansion_terms",
    "sequential_pattern_support",
    "kendall_tau_hour_value",
    "brier_score_decomposition",
    "heaps_vocab_growth",
    "stump_cv_events",
    "association_rules_copurchase",
    "retention_cohort_matrix",
    "int8_quantized_topk",
    "event_type_week_pivot",
    "isotonic_recalibration_bins",
    "ece_after_isotonic_recalibration",
    "ridge_two_factor_revenue",
    # post-sweep r10 twins (VERDICT r10 #3): the streaming pivot replays
    # the full events table through the file stream, so its envelope is
    # the replay shard-write + ONE complete-mode 5-counter aggregation
    "streaming_pivot_ingest",
    # round-11 additions
    "cusum_daily_revenue",
    "cohens_kappa_raters",
    "ngram_novelty_ppm",
    "name_edit_near_dup_pairs",
    "hll_user_days_estimate",
    "anova_value_by_type",
    "gains_decile_lift",
    "hll_merge_registers_exact",
    # round-11 wave-3/4
    "mann_whitney_weekend_value",
    "welch_ttest_weekend_value",
    "logrank_conversion_cohorts",
    "kaplan_meier_conversion",
    "skipgram_training_pairs",
    "negative_sampling_table",
    "event_type_user_jaccard",
    "streaming_cusum_ingest",
    # round-11 wave-5
    "cmh_discount_return_by_weekday",
    "dedup_threshold_sweep",
    "streaming_mann_whitney_ingest",
    "streaming_welch_ingest",
    "wilcoxon_signed_rank_user_value",
    "mcnemar_purchase_weekend",
    "ablation_grid_assignments",
    "kruskal_wallis_value_by_type",
    "friedman_value_by_type",
    "mase_seasonal_naive",
    "brown_forsythe_value_by_type",
    "cronbach_alpha_type_values",
    "streaming_kruskal_ingest",
    "cramers_v_type_weekday",
    "kaplan_meier_greenwood",
    # round-12: the rows-only -> exact conversions + the BF redefinition
    # (brown_forsythe already above; its r12 two-level integer median
    # re-ran under this harness after the change)
    "bpe_train_merges",
    "hll_partition_merge",
    "embedding_pca_project",
    "embedding_topk_lsh",
    # round-13: the deterministic-integer IVF/PQ/IVF-PQ exact lifts
    "embedding_topk_ivf",
    "embedding_topk_pq",
    "embedding_topk_ivfpq",
    # round-14: the PRODUCTION IVF path (VERDICT r13 #8) — sqrt(n)
    # centroids, fixed n_probe
    "production_ivf_topk",
]


def _production_ivf(spark, sf_dir):
    """The 100-TB IVF serve path (VERDICT r13 #8): the exact twin
    `embedding_topk_ivf` pins 16 cells for oracle tractability and so
    probes 25% of the corpus by design — its stress envelope (42.8 s at
    100×) measures the twin's geometry, not the production path. This
    entry stresses `similarity.ivf_topk`'s real scale shape: ~sqrt(n)
    centroids from the float-KMeans build, a WRITE-ONCE index
    (localCheckpoint stands in for the partitioned-by-cell parquet a
    production pipeline persists), and a fixed n_probe — so the scanned
    fraction is n_probe/sqrt(n), SUB-LINEAR in corpus size, and search
    cost grows ~sqrt(n) per query. Build and search are timed
    separately: the build is a once-per-corpus artifact, the search is
    the recurring 100-TB cost."""
    import math

    from streaming_ml_with_ksql_spark.operators import similarity

    emb = io_mod.load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_centroids = max(16, min(512, math.isqrt(n)))
    n_probe = 8
    t0 = time.perf_counter()
    index = similarity.build_ivf_index(emb, n_centroids=n_centroids)
    index.corpus = index.corpus.localCheckpoint(eager=True)
    build_s = time.perf_counter() - t0
    print(
        f"production_ivf_topk: build {build_s:.1f}s (n={n}, "
        f"centroids={n_centroids}, probed_fraction="
        f"{n_probe / n_centroids:.4f})"
    )
    queries = (
        similarity._as_double(emb)
        .filter(F.col("vec_id") < 100)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    return similarity.ivf_search(
        index, queries, k=5, n_probe=n_probe, exclude_self=True
    )


# Pseudo-queries the stress harness runs that are NOT registry entries
# (production paths whose registered faces are streaming or exact-twin
# variants).
EXTRA_QUERIES = {"production_ivf_topk": _production_ivf}


def build(spark, mult: int) -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    for name, shifts in REPLICATE.items():
        base = io_mod.load_table(spark, SF_DIR, name)
        parts = []
        for i in range(mult):
            df = base
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    for name in PASSTHROUGH:
        io_mod.load_table(spark, SF_DIR, name).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )


def main() -> None:
    """python scripts/stress_scale.py [multiplier] [query ...]

    With explicit query names, runs ONLY those (the 100x deep-stress
    mode, VERDICT r7 #6 — full-list runs at 100x would take hours; the
    point there is the handful of operators whose candidate volume can
    go superlinear)."""
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:]
    spark = get_spark(app_name="stress_scale")
    t0 = time.perf_counter()
    build(spark, mult)
    print(f"built {mult}x tables in {time.perf_counter()-t0:.1f}s -> {OUT}")

    qs = registry.queries()
    for name in only or QUERIES:
        # Construction INSIDE the timed region: operators with eager
        # checkpoints (connected components) do real work at build time.
        # Force FULL-WIDTH evaluation: a bare .count() lets Catalyst
        # prune expensive output columns (dedup_span_rewrite's whole
        # rewrite was skipped — 0.9 s pruned vs 42.7 s real at 100x), so
        # hash every output column into the aggregate.
        t0 = time.perf_counter()
        df = (EXTRA_QUERIES.get(name) or qs[name])(spark, OUT)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: a BIGINT sum of 64-bit hashes overflows under
            # the session's ANSI mode
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        print(f"{name}: {row['n']} rows in {time.perf_counter()-t0:.1f}s")
        # localCheckpoint blocks accumulate across queries in this
        # single long-lived session — 133 queries of them OOMed the
        # r11 full sweep at query 134. The prior query's result is
        # already forced, so dropping every persistent RDD between
        # queries is safe and bounds block-manager memory at one
        # query's working set.
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        it = jmap.entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(False)
    spark.stop()


if __name__ == "__main__":
    main()
