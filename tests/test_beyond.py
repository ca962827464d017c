"""Beyond-reference relational surface vs DuckDB oracle: as-of join,
session windows, lag/lead analytics, CDC snapshot, and the streaming
parity queries (SURVEY.md §2.9, S3, §2.5)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches

BEYOND = [
    "asof_view_attribution",
    "session_window_agg",
    "lag_lead_features",
    "cdc_snapshot_customers",
    "scd2_customer_history",
    "orders_above_customer_avg",
    "order_priority_cube",
    "enriched_window_join_salted",
    "corpus_clean_pipeline",
    "multi_resolution_rollup",
    "hourly_gap_fill_locf",
    "bloom_pruned_join",
    # round-5 additions
    "near_dup_triangle_counts",
    "near_dup_clustering_coefficient",
    "value_outliers_zscore",
    "doc_hash_embed",
    "quantile_sketch_events",
    "corpus_curation_pipeline",
    "ksql_generated_traffic",
    # round-6 additions
    "stratified_sample_documents",
    "term_postings_index",
    "embedding_scale_features",
    "touch_attribution",
    "orc_source_roundtrip",
    "gdpr_purge_audit",
    "corpus_chunk_sliding",
    "session_event_paths",
    "image_dhash_png",
    "text_semantic_search",
    "events_quality_rules",
    "avro_source_roundtrip",
    "cdc_wire_snapshot_customers",
    "corpus_rag_pipeline",
    "series_pattern_match",
    "image_dedup_groups",
    "langid_classification_report",
    "user_value_trend_fit",
    "conversion_funnel_windowed",
    "customer_rfm_segments",
    "doc_quality_score",
]

# Streaming replays are slower — run them at sf0.001; the driver re-checks
# at sf0.01.
STREAMING = [
    "streaming_hopping_window",
    "streaming_latest_per_key",
    "streaming_sessionize",
    "streaming_interval_join",
    "streaming_interval_join_left",
    "streaming_interval_join_full",
    "streaming_dedup_exact",
    "streaming_cdc_upsert",
    "streaming_interval_join_right",
    "streaming_corpus_ingest",
    "streaming_cms_cells",
    # round-5 additions
    "streaming_quantile_sketch",
    "streaming_threshold_alert",
    "streaming_multi_resolution_rollup",
    "streaming_events_quality",
]


@pytest.mark.parametrize("name", BEYOND)
@pytest.mark.sweep
def test_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize("name", STREAMING)
@pytest.mark.sweep
def test_streaming_query_matches_oracle(spark, sf_small, name):
    assert_query_matches(spark, name, sf_small)


def test_bloom_filter_prunes_without_false_negatives(spark, sf_medium):
    """The bloom pre-filter must (a) never drop a matching fact row — the
    pruned set is a superset of the true semi-join — and (b) actually
    prune (false-positive rate well under 100%), and the final join must
    be shuffle-hash, not broadcast (the modeled regime)."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import bloom

    li = io_mod.load_table(spark, sf_medium, "lineitem").select("l_orderkey")
    urgent = (
        io_mod.load_table(spark, sf_medium, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    words = bloom.build_bloom_words(urgent, "o_orderkey")
    pruned = li.filter(bloom.might_contain(F.col("l_orderkey"), words))
    n_fact, n_pruned = li.count(), pruned.count()
    n_true = li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi").count()
    assert n_true <= n_pruned, "bloom dropped matching rows (false negative)"
    assert n_pruned < n_fact * 0.5, f"bloom barely pruned: {n_pruned}/{n_fact}"
    plan = (
        bloom.bloom_pruned_join(li, urgent, "l_orderkey", "o_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan


def test_triangle_counts_known_graphs(spark):
    """K4 has 4 triangles with every vertex in 3; a path has none; a
    triangle with a pendant vertex counts 1-1-1-0; duplicate and
    reversed edge rows must not inflate counts."""
    from streaming_ml_with_ksql_spark.operators import graph

    def tc(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r.vertex: r.n_triangles
            for r in graph.triangle_counts(df).collect()
        }

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tc(k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # duplicates + reversed directions collapse to the same undirected set
    assert tc(k4 + [(b, a) for a, b in k4] + k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    assert tc([(0, 1), (1, 2), (2, 3)]) == {0: 0, 1: 0, 2: 0, 3: 0}
    assert tc([(0, 1), (1, 2), (0, 2), (2, 3)]) == {0: 1, 1: 1, 2: 1, 3: 0}
    # two triangles sharing an edge: shared endpoints count 2
    two = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    assert tc(two) == {0: 1, 1: 2, 2: 2, 3: 1}
