"""TPC-H-style sanity plans (SURVEY.md §7 Phase 2.6).

These exercise the relational operators the reference never declares but a
complete engine must have (sorts/limits, set ops, rollup, semi/anti joins,
pivot — SURVEY.md §2.9), over the driver's star schema.

Scale notes:
- Money aggregates are rounded (4 dp) at the end — engines sum doubles in
  different orders; the oracle comparison needs a canonical value. Rounding
  happens *after* aggregation, so it does not perturb the plan.
- Dimension joins (region/nation/customer/supplier) are broadcast; only
  lineitem↔orders is a real shuffled join, on their natural keys, where AQE
  sizes the partitions.
- Filters are written against the scan columns so Catalyst pushes them into
  the parquet reader (verified via .explain — PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_orders_per_customer",
    "returnflag_rollup",
    "event_type_pivot",
    "customers_without_orders",
    "active_event_customers",
    "orders_above_customer_avg",
    "order_priority_cube",
    "late_shipment_priority",
    "top_supplier_per_nation",
]


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, grouped revenue, deterministic top-10.

    customer is broadcast (bounded dim); orders↔lineitem shuffles on the
    order key. Ties broken by o_orderkey so LIMIT is deterministic.
    """
    cut = F.lit(cutoff).cast("timestamp")
    joined = (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(
            orders.filter(F.col("o_orderdate") < cut),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the dimension chain; revenue per
    nation where supplier and customer share the nation. All dims broadcast."""
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-K per group via ranking window (SURVEY.md §2.9 'ranking window
    functions'). Deterministic: price desc, orderkey asc."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= k)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus", "rank_in_customer"
        )
    )


def returnflag_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP aggregate (SURVEY.md §2.9 grouping sets)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot: per-user event-type count matrix. Explicit pivot values keep
    the plan a single pass (no distinct-scan) and the schema stable."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "error", "signup"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["view", "click", "purchase", "error", "signup"])
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, *, status: str = "F"
) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order in the given status.
    (Unfiltered, every customer has orders in the testdata — the filtered
    form keeps the anti join non-trivial at every scale factor.)"""
    return customer.join(
        orders.filter(F.col("o_orderstatus") == status),
        customer.c_custkey == orders.o_custkey,
        "left_anti",
    ).select("c_custkey", "c_name", "c_mktsegment")


def active_event_customers(customer: DataFrame, events: DataFrame) -> DataFrame:
    """Semi join (EXISTS): customers whose key appears as an events user."""
    return customer.join(
        events, customer.c_custkey == events.user_id, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


def orders_above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated-scalar-subquery shape (SURVEY.md §2.9 subqueries):
    orders priced above their own customer's average. Expressed
    decorrelated — per-key aggregate + key join — which is the plan any
    engine should reach; the oracle states the correlated form and DuckDB
    decorrelates it itself."""
    # Cross-engine canonical average: sum exactly in DECIMAL(18,2) (TPC-H
    # prices are exact 2-dp values), then one double division. avg(double)
    # is NOT canonical — Spark and DuckDB sum doubles in different orders
    # and diverge in the last ulp, which a value-hash compare catches.
    avgs = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cust_avg")
    )
    return (
        orders.join(avgs, orders.o_custkey == avgs.ck)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


def order_priority_cube(orders: DataFrame) -> DataFrame:
    """CUBE aggregate (SURVEY.md §2.9 grouping sets): all subtotal
    combinations over (status, priority)."""
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    )


def late_shipment_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    start: str = "1996-01-01",
    end: str = "1996-07-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 shape (SURVEY.md §2.9 subqueries — correlated EXISTS):
    per-priority count of orders in a window having at least one lineitem
    shipped more than ``late_days`` after the order date (the testdata has
    no l_commitdate/l_receiptdate, so lateness is shipdate vs orderdate).

    The correlated EXISTS decorrelates to a left-semi join whose condition
    carries the correlated predicate — one shuffle on the order key, date
    filter pushed to the orders scan. The semi join stops probing an order
    at its first match (no count-then-filter materialization)."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    )
    cond = (lineitem["l_orderkey"] == o["o_orderkey"]) & (
        lineitem["l_shipdate"]
        > o["o_orderdate"] + F.expr(f"INTERVAL {late_days} DAYS")
    )
    return (
        o.join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def top_supplier_per_nation(
    supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """TPC-H Q2 shape (SURVEY.md §2.9 subqueries — correlated scalar MIN/MAX
    against a dimension-scoped subset): suppliers holding their nation's
    maximum account balance, with region/nation names attached (no partsupp
    table in the testdata, so the correlation scopes over nationkey).

    Decorrelated to per-key max + equality join; max() SELECTS an existing
    double (no arithmetic), so the value survives cross-engine bit-exact —
    unlike avg, which needs the decimal-sum treatment. Dimensions broadcast."""
    mx = supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    return (
        supplier.join(
            mx,
            (supplier["s_nationkey"] == mx["nk"])
            & (supplier["s_acctbal"] == mx["max_bal"]),
        )
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("r_name", "n_name", "s_name", "s_acctbal")
    )
