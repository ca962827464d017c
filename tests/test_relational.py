"""Phase-2 relational surface vs DuckDB oracle (SURVEY.md §7 Phase 2)."""

from __future__ import annotations

import pytest

from streaming_ml_with_ksql_spark import registry
from tests.oracle import assert_query_matches

PHASE2 = [
    "projection_filter_cast",
    "timestamp_format",
    "array_constructor",
    "case_when_indicators",
    "latest_per_key",
    "enriched_window_join",
    "rolling_counts",
    "distinct_users",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_orders_per_customer",
    "returnflag_rollup",
    "event_type_pivot",
    "customers_without_orders",
    "active_event_customers",
    "key_set_ops",
]


@pytest.mark.parametrize("name", PHASE2)
def test_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


def test_all_oracle_keys_subset_of_queries():
    qs, os_ = registry.queries(), registry.oracle_sql()
    assert set(os_) <= set(qs)
