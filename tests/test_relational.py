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
    "user_event_type_diversity",
    "order_value_percentiles",
    "orders_above_customer_avg",
    "late_shipment_priority",
    "top_supplier_per_nation",
    "value_rank_suite",
    "event_type_unpivot",
    "order_grouping_sets",
    "volume_shipping",
    "important_part_values",
    "part_supplier_counts",
    "large_volume_customers",
    "waiting_suppliers",
    "churned_high_balance",
    "heavy_hitters_users",
    "json_extract_props",
    "partitioned_sink_prune",
    "pandas_udaf_median",
    "python_udtf_ngrams",
    # round-3 additions: remaining TPC-H shapes (Q6/Q8/Q9/Q10/Q12/Q13/Q14/
    # Q17/Q19/Q20 analogs)
    "forecast_revenue",
    "market_share",
    "product_profit",
    "returned_item_topk",
    "shipping_delay_priority",
    "promo_revenue",
    "order_count_histogram",
    "small_qty_revenue",
    "disjunctive_revenue",
    "excess_part_suppliers",
    "scalar_function_suite",
    "hot_window_events",
    "cms_heavy_hitters",
    "zorder_layout",
    "events_profile",
    "feature_drift",
    "point_in_time_join",
    "user_value_trend",
    "fuzzy_name_matches",
    "conversion_funnel",
    "weekly_retention_cohorts",
    "top_revenue_supplier",
]


@pytest.mark.parametrize("name", PHASE2)
@pytest.mark.sweep
def test_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


def test_all_oracle_keys_subset_of_queries():
    qs, os_ = registry.queries(), registry.oracle_sql()
    assert set(os_) <= set(qs)


def test_approx_sketches_error_bounds(spark, sf_medium):
    """HLL distinct within 3*rsd of exact; approx median within 5% of the
    exact per-group median."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod

    ev = io_mod.load_table(spark, sf_medium, "events")
    from streaming_ml_with_ksql_spark.registry.q06_sketchseries import (
        q_approx_sketches,
    )

    approx = {
        r.event_type: r for r in q_approx_sketches(spark, sf_medium).collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap.approx_users - ex.users) <= max(3 * 0.02 * ex.users, 2)
        assert abs(ap.approx_p50_value - ex.p50) <= 0.05 * abs(ex.p50) + 1e-6


def test_hll_merge_equals_direct_and_bounds_error(spark, sf_medium):
    """HLL registers are order-insensitive: merging daily sketches must
    reproduce the single-pass estimate EXACTLY, and both must sit within
    ~3% of the exact distinct count (default lgConfigK=12 accuracy).
    Pins the DataSketches (hll_sketch_agg/hll_union_agg) identity that
    the registered hll_partition_merge query demonstrated before its r12
    port to the register-exact oracled idiom."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod

    ev = io_mod.load_table(spark, sf_medium, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "direct_users"
        )
    )
    rows = {
        r["event_type"]: r
        for r in merged.join(direct, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        assert r["merged_users"] == r["direct_users"], et
        assert abs(r["direct_users"] - exact[et]) / exact[et] < 0.03, et


def test_hll_partition_merge_registered_query(spark, sf_medium):
    """The register-exact port (r12): merged-from-daily-partials must
    equal the direct single-pass estimate EXACTLY (max is associative),
    and both must sit within the 256-register HLL error (~3 sigma =
    19.5%) of the exact user-day count it emits alongside."""
    from streaming_ml_with_ksql_spark import registry

    out = registry._REGISTRY["hll_partition_merge"].spark(spark, sf_medium)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["merged_centi_user_days_d"] == r["direct_centi_user_days_d"]
        est = r["merged_centi_user_days_d"] / 100.0
        exact = r["exact_user_days_d"]
        assert exact > 640, "keyed cardinality must clear the bias zone"
        assert abs(est - exact) / exact < 0.195, (r["event_type"], est, exact)


def test_heavy_hitters_pigeonhole_across_partitions(spark, sf_medium):
    """Phase-1 candidates must be a superset of the true answer under ANY
    partitioning — force a many-partition layout (worst case for the
    per-partition threshold) and check the final result still equals the
    exact GROUP BY ... HAVING."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import topk

    ev = io_mod.load_table(spark, sf_medium, "events").select("user_id")
    scattered = ev.repartition(32)  # round-robin: keys spread maximally
    got = {
        (r.user_id, r.n)
        for r in topk.heavy_hitters(scattered, "user_id", min_count=70).collect()
    }
    exact = {
        (r.user_id, r.n)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 70)
        .collect()
    }
    assert got == exact


def test_cms_merge_is_exact_and_never_underestimates(spark, sf_medium):
    """Count-min counters are additive: per-day grids summed cell-wise
    must equal the single-pass grid EXACTLY (not approximately), and the
    estimate can never be below the true count."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import topk

    ev = io_mod.load_table(spark, sf_medium, "events")
    direct = topk.cms_cells(ev.select("user_id"), "user_id")
    daily = topk.cms_cells(
        ev.select("user_id", F.to_date("ts").alias("day")),
        "user_id",
        extra_group=["day"],
    )
    merged = daily.groupBy("row_i", "col").agg(F.sum("cnt").alias("cnt"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    est = topk.cms_estimates(ev.select("user_id"), "user_id", min_count=1)
    assert est.filter(F.col("cms_est") < F.col("exact_n")).count() == 0


def test_hll_registers_estimate_and_merge_identity(spark, sf_medium):
    """The first-principles HLL (exact-oracled register table): the
    estimator must land within the theoretical ~3*1.04/sqrt(256) ≈ 20%
    of the exact distinct count for every event_type, and max-merging
    daily partial register tables must reproduce the direct sketch
    register-for-register (the mergeability identity)."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as sio
    from streaming_ml_with_ksql_spark.operators import topk

    ev = sio.load_table(spark, sf_medium, "events")
    direct = topk.hll_registers(ev, "user_id", group_cols=["event_type"])
    regs: dict[str, list] = {}
    for r in direct.collect():
        regs.setdefault(r.event_type, []).append((r.bucket, r.register))
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(regs) == set(exact)
    for et, rows in regs.items():
        est = topk.hll_estimate_from_registers(rows)
        assert abs(est - exact[et]) / exact[et] < 0.20, (et, est, exact[et])

    daily = topk.hll_registers(
        ev.withColumn("day", F.date_trunc("day", "ts")),
        "user_id",
        group_cols=["event_type", "day"],
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("register").alias("register")
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(
        (r.event_type, r.bucket, r.register) for r in direct.collect()
    )
    assert a == b


def test_quantile_sketch_error_bound_and_merge(spark, sf_medium):
    """Histogram quantile sketch: (1) every estimate sits within one
    bucket_width of the exact quantile; (2) cells are MERGEABLE — the
    sketch of two disjoint shards, merged by summing counts, equals the
    single-pass sketch exactly (the 100 TB rollup property)."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as sio
    from streaming_ml_with_ksql_spark.operators import topk

    ev = sio.load_table(spark, sf_medium, "events")
    width = 5.0
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    cells = topk.quantile_sketch_cells(ev, "value", bucket_width=width)
    est = {
        r.q: r.est
        for r in topk.quantile_estimates(
            cells, bucket_width=width, qs=qs
        ).collect()
    }
    exact = ev.select(
        *[
            F.expr(f"percentile(value, {q})").alias(f"p{i}")
            for i, q in enumerate(qs)
        ]
    ).first()
    for i, q in enumerate(qs):
        assert abs(est[q] - exact[i]) <= width, (q, est[q], exact[i])

    # mergeability: shard by event parity, sum cell counts, compare
    a = topk.quantile_sketch_cells(
        ev.filter(F.col("event_id") % 2 == 0), "value", bucket_width=width
    )
    b = topk.quantile_sketch_cells(
        ev.filter(F.col("event_id") % 2 == 1), "value", bucket_width=width
    )
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.sum("n").alias("n"))
    )
    direct = {(r.bucket, r.n) for r in cells.collect()}
    assert {(r.bucket, r.n) for r in merged.collect()} == direct
