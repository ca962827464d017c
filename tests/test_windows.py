"""Flagship hopping-window aggregate vs DuckDB oracle (SURVEY.md Phase 1)."""

from __future__ import annotations

from tests.oracle import assert_query_matches


def test_hopping_window_matches_oracle_small(spark, sf_small):
    assert_query_matches(spark, "hopping_window_agg", sf_small)


def test_hopping_window_matches_oracle_medium(spark, sf_medium):
    assert_query_matches(spark, "hopping_window_agg", sf_medium)


def test_tumbling_window_matches_oracle(spark, sf_small):
    assert_query_matches(spark, "tumbling_window_agg", sf_small)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
