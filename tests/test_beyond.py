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
]


@pytest.mark.parametrize("name", BEYOND)
def test_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize("name", STREAMING)
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
