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
    "volume_shipping",
    "important_part_values",
    "part_supplier_counts",
    "large_volume_customers",
    "waiting_suppliers",
    "churned_high_balance",
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


def volume_shipping(
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The nation dimension joins twice under different roles (customer
    nation / supplier nation) — both broadcast, so the only shuffle is
    lineitem↔orders on the order key. The two-nation disjunction is applied
    AFTER the role joins (it references both sides), but customer/supplier
    are pre-filtered to the two nations' keys so the fact rows that can
    never qualify drop at the broadcast probes, not at the end."""
    n_pair = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    cn = n_pair.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n_pair.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def important_part_values(
    lineitem: DataFrame, part: DataFrame, *, multiplier: float = 1.5
) -> DataFrame:
    """TPC-H Q11 shape (HAVING against an uncorrelated scalar subquery):
    parts whose lineitem value exceeds ``multiplier`` × the per-part
    average (average-relative rather than Q11's fixed fraction, so the
    selection stays non-trivial at every scale factor — part count grows
    with sf).

    The per-part aggregate is computed once; the global average
    re-aggregates the (already tiny) per-part frame rather than rescanning
    lineitem, and joins back as a broadcast scalar. Sums are exact
    DECIMAL(18,2) (prices are 2-dp) so the threshold compare is
    bit-identical cross-engine (1.5 and the divide are the same double ops
    in the same order on both engines)."""
    val = lineitem.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val_dec")
    )
    total = val.agg(
        F.sum("val_dec").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("npart"),
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("val_dec").cast("double")
            > F.lit(multiplier) * (F.col("tot") / F.col("npart"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey", "p_name", F.col("val_dec").cast("double").alias("part_value")
        )
    )


def part_supplier_counts(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape (NOT IN subquery + COUNT DISTINCT): supplier counts
    per (brand, type), excluding suppliers with negative balance (the
    testdata's stand-in for Q16's complaint filter; no partsupp table, so
    observed lineitem (part, supp) pairs serve as the association).

    The distinct over (part, supp) is the one real shuffle; the exclusion
    list is a broadcast anti join and the part attributes a broadcast
    equi-join. count_distinct then reuses the same hash partitioning."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(
            F.broadcast(excluded),
            pairs.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_qty: int = 250,
) -> DataFrame:
    """TPC-H Q18 shape (IN over a GROUP BY ... HAVING subquery): orders
    whose total lineitem quantity exceeds ``min_qty``, with customer names.

    The HAVING subquery decorrelates to an aggregate + equi-join on the
    order key — the aggregate output (orders over the threshold) is tiny,
    so it is the probe side; quantity sums are DECIMAL-exact and emitted
    as DOUBLE (driver nullable/decimal bridge rule)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
    )


def waiting_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS, both correlated): per supplier,
    the number of finalized multi-supplier orders where ONLY that supplier
    shipped late (> ``late_days`` after the order date — the testdata has no
    commit/receipt dates).

    Shape: one lineitem↔orders shuffle builds (order, supplier) pairs and
    the late subset; EXISTS becomes a left-semi self-join and NOT EXISTS a
    left-anti self-join, both on the order key — three shuffles total over
    frames that shrink at every step, never a per-order count
    materialization. Supplier/nation attach by broadcast at the end."""
    lo = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    all_pairs = lo.select("l_orderkey", "l_suppkey").distinct()
    late = (
        lo.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1, l2, l3 = late.alias("l1"), all_pairs.alias("l2"), late.alias("l3")
    sole_late = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def churned_high_balance(
    customer: DataFrame, orders: DataFrame, *, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 shape (scalar AVG subquery + anti-joined NOT EXISTS):
    customers with above-average positive balance and no order since
    ``since``, aggregated per market segment.

    The scalar average broadcasts (decimal-sum canonical, per the
    cross-engine avg rule); NOT EXISTS decorrelates to a left-anti join
    against date-filtered orders — the date filter is pushed to the orders
    scan, so the anti join probes only recent orders."""
    pos_avg = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(pos_avg)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
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


def forecast_revenue(
    lineitem: DataFrame,
    *,
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.06,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no joins, no groupBy.

    Every predicate references a raw scan column, so all three push into the
    parquet reader (``PushedFilters`` carries the shipdate range, the
    discount band and the quantity cap) and column pruning reads exactly
    three columns. At 100 TB this is the canonical "the scan IS the query"
    plan: partial sums map-side, a single scalar crosses the exchange."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


def market_share(
    nation: DataFrame,
    region: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    target_nation: str = "NATION_1",
    target_region: str = "AMERICA",
    year_start: str = "1996-01-01",
    year_end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional-sum / total-sum per year.

    Customer nation is restricted to one region (broadcast probe on the
    fact), supplier nation feeds the CASE numerator. Both sums come out of
    ONE aggregation over one shuffled lineitem↔orders join — the ratio is a
    post-aggregation scalar expression, so the share costs nothing beyond
    the base volume query. Rounded sums divide in double on both engines."""
    region_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == target_region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(year_start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(year_end).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(region_nations), F.col("c_nationkey") == F.col("cn_key"), "left_semi"
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, vol).otherwise(0.0)),
                4,
            ).alias("nation_volume"),
            F.round(F.sum(vol), 4).alias("total_volume"),
        )
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
    )


def product_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    name_substr: str = "red",
    cost_factor: float = 0.1,
) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, ship year) over parts
    whose name contains a token. The testdata has no partsupp/supplycost, so
    cost is ``cost_factor * p_retailprice * l_quantity`` — same expression
    tree, same join graph minus partsupp.

    part is filtered BEFORE the join (contains() prunes ~95% of parts) and
    broadcast, so lineitem rows for non-matching parts die at the probe;
    the only shuffle is the final (nation, year) aggregation."""
    p = part.filter(F.col("p_name").contains(name_substr)).select(
        "p_partkey", "p_retailprice"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        cost_factor
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


def returned_item_topk(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    quarter_start: str = "1996-01-01",
    quarter_end: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by lost revenue on returned items.

    Orders are date-pruned at the scan, lineitem keeps only R-flag rows
    (both filters pushed), the join shuffles only the surviving quarter.
    Top-k is ORDER BY (rounded revenue DESC, custkey) LIMIT k — Spark
    executes it as TakeOrderedAndProject (per-partition heaps, no global
    sort, no single-partition window), and the rounded-revenue + custkey
    total order makes the cut deterministic cross-engine."""
    rev = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(quarter_start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(quarter_end).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    topk = rev.orderBy(F.col("revenue").desc(), F.col("o_custkey")).limit(k)
    return (
        topk.join(F.broadcast(customer), topk.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            F.col("n_name").alias("nation"),
            "c_mktsegment",
        )
    )


def shipping_delay_priority(
    orders: DataFrame, lineitem: DataFrame, *, late_days: int = 60
) -> DataFrame:
    """TPC-H Q12 shape: per ship-year, how many late-shipped lines belong to
    high- vs low-priority orders (CASE-in-aggregate over a join). The
    testdata has no shipmode/commitdate, so the Q12 axes become ship year ×
    a shipdate-vs-orderdate lateness predicate.

    The lateness predicate is non-equi but intra-row (after the equi-join),
    so the join itself stays a plain hash join on the order key."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    month_start: str = "1996-01-01",
    month_end: str = "1996-02-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for one month. One
    date-pruned scan, one broadcast part join, one aggregation producing
    both the CASE numerator and the denominator; the percentage divides the
    two ROUNDED sums (identical double op on both engines)."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(month_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(month_end).cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == promo_type, vol).otherwise(0.0)), 4
            ).alias("promo_rev"),
            F.round(F.sum(vol), 4).alias("total_rev"),
        )
    )
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6).alias(
            "promo_revenue_pct"
        )
    )


def order_count_histogram(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, including
    the zero bucket (LEFT join, count of non-null keys, then a second
    groupBy over the per-customer counts).

    Two shuffles by construction (per-customer count, then histogram); the
    second operates on one row per customer, and the histogram key has at
    most a few dozen distinct values — partial aggregation collapses it
    map-side, so the second exchange moves almost nothing."""
    per_cust = (
        customer.join(
            orders.select("o_orderkey", "o_custkey"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def small_qty_revenue(
    lineitem: DataFrame, part: DataFrame, *, brand: str = "Brand#1", factor: float = 0.2
) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders of less than ``factor`` × the
    part's average quantity (correlated scalar AVG subquery, decorrelated to
    a per-part aggregate joined back to the fact).

    The brand filter restricts both the aggregate and the probe side BEFORE
    any shuffle (semi-join through the broadcast part list). Quantities are
    integral doubles, so the per-part average is bit-exact cross-engine
    without decimal games; only the final revenue needs rounding.

    The avg_qty frame is fact-DERIVED (one row per brand part — grows with
    scale factor), so it is deliberately NOT broadcast-hinted: both sides
    of that join already hash-partition on the part key, and AQE may still
    elect a broadcast when the brand slice is small. Forcing it would OOM
    the driver at 100 TB."""
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.lit(factor) * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly")
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate (three brand/size/quantity
    bands). The join stays a single broadcast hash join on the part key; the
    disjunction is a post-join filter referencing both sides, which Catalyst
    keeps as one predicate — no union-of-three-joins blowup, no re-scan."""
    p = part.select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def excess_part_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    *,
    part_type: str = "PROMO",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    share: float = 0.5,
) -> DataFrame:
    """TPC-H Q20 shape (nested correlated IN, two levels): suppliers who in
    one year shipped more than ``share`` of their all-time volume of some
    promo-type part. partsupp's availqty doesn't exist, so "available" is
    the supplier's all-time shipped quantity of that part — the correlated
    comparison (year volume vs. own total) keeps Q20's two-aggregate nesting.

    Both aggregates come from ONE scan of the part-filtered lineitem (a
    conditional sum per (part, supplier) beats two scans + a self-join);
    the qualifying pairs then semi-join suppliers. Quantities are integral
    doubles -> the share compare is exact."""
    pk = part.filter(F.col("p_type") == part_type).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    in_year = (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(year_end).cast("timestamp")
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in_year, F.col("l_quantity")).otherwise(0.0)).alias("year_qty"),
        F.sum("l_quantity").alias("total_qty"),
    )
    qualifying = per_pair.filter(
        F.col("year_qty") > F.lit(share) * F.col("total_qty")
    ).select("l_suppkey").distinct()
    return (
        supplier.join(
            qualifying, supplier.s_suppkey == qualifying.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
    )
