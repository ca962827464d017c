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
]


@pytest.mark.parametrize("name", BEYOND)
def test_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_query_matches_oracle(spark, sf_small, name):
    assert_query_matches(spark, name, sf_small)
