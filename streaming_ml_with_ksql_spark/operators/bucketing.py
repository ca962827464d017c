"""Bucketed-table co-located joins — pre-shuffled physical layout.

The reference co-partitions Kafka topics by key so KSQL joins never
re-shuffle (reference: README.md:56-60 — PARTITION BY before the join);
Spark's equivalent for tables is bucketing: `bucketBy(n, key).sortBy(key)`
writes each side pre-hash-partitioned into n buckets, and a subsequent
equi-join on the bucket key plans as a SortMergeJoin with NO Exchange on
either side — the join reads co-located buckets file-against-file.

At 100 TB this is the difference between re-shuffling both fact tables on
every join and paying the shuffle ONCE at write time: any number of later
joins/aggregations on the bucket key are exchange-free, which is why
fact tables that join repeatedly (orders ⋈ customer, lineitem ⋈ orders)
should be bucketed on their join key at ingest.

Buckets also bound memory: each task merges one bucket pair, so bucket
count is chosen so a bucket fits an executor (n_buckets ≈ table_size /
target_partition_size, a power of two for future bucket-count unions).
"""

from __future__ import annotations

import atexit
import itertools
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "colocated_join", "zorder_index"]

_SEQ = itertools.count()
# (session id, cache key) -> registered table name; bucketed copies are
# written once per session+input and re-read by every later call.
_BUCKETED: dict[tuple[int, str], str] = {}


def write_bucketed(
    df: DataFrame,
    key: str,
    *,
    n_buckets: int = 8,
    cache_key: str | None = None,
) -> DataFrame:
    """Write ``df`` bucketed+sorted by ``key`` into a temp-backed external
    table and return the bucketed read-back. Memoized per (session,
    cache_key): the shuffle is paid once, every later join is exchange-free.
    """
    spark = df.sparkSession
    memo = (id(spark), cache_key or f"anon_{next(_SEQ)}")
    name = _BUCKETED.get(memo)
    if name is None or not spark.catalog.tableExists(name):
        name = f"sgraft_bucketed_{next(_SEQ)}"
        path = tempfile.mkdtemp(prefix=f"sgraft_bucket_{name}_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        (
            df.write.format("parquet")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
        _BUCKETED[memo] = name
    return spark.table(name)


def colocated_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
    left_cache_key: str | None = None,
    right_cache_key: str | None = None,
) -> DataFrame:
    """Equi-join two frames through matching bucketed layouts: both sides
    are written with the same bucket count on their join key, and the join
    is hinted to SortMergeJoin so the plan contains no Exchange above the
    scans (asserted in tests/test_plans.py — broadcast would also avoid
    the shuffle here, but at fact-⋈-fact scale broadcast is off the table
    and bucketing is the strategy that survives)."""
    bl = write_bucketed(left, left_key, n_buckets=n_buckets, cache_key=left_cache_key)
    br = write_bucketed(
        right, right_key, n_buckets=n_buckets, cache_key=right_cache_key
    )
    return bl.hint("merge").join(br, bl[left_key] == br[right_key])


_PARTITIONED: dict[tuple[int, str], str] = {}


def write_partitioned(
    df: DataFrame,
    part_col: str,
    *,
    cache_key: str | None = None,
) -> str:
    """Write ``df`` as a Hive-style partitioned parquet layout
    (``part_col=value/`` directories) into a temp-backed path and return
    the path. Memoized per (session, cache_key).

    This is the other half of the physical-layout story next to bucketing:
    partitioning by a LOW-cardinality predicate column (ingest date,
    tenant, language) lets every later query that filters on it skip whole
    directories at planning time — at 100 TB, a day-partitioned events
    table makes "last 3 days" read 0.1% of the files. The partition column
    should be coarse (directories, not millions of tiny files); bucketing
    covers the high-cardinality join keys."""
    spark = df.sparkSession
    memo = (id(spark), cache_key or f"anon_part_{next(_SEQ)}")
    path = _PARTITIONED.get(memo)
    if path is None:
        path = tempfile.mkdtemp(prefix="sgraft_part_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        df.write.partitionBy(part_col).mode("overwrite").parquet(path)
        _PARTITIONED[memo] = path
    return path


def zorder_index(
    df: DataFrame,
    col_a,
    col_b,
    *,
    a_min,
    a_max,
    b_min,
    b_max,
    bits: int = 16,
) -> DataFrame:
    """Morton (Z-order) curve index over two dimensions — the multi-column
    data-layout key (Delta OPTIMIZE ZORDER, Iceberg sort orders): sorting
    by ``zindex`` co-locates rows that are close in BOTH dimensions, so
    min/max file statistics prune scans filtered on either column, where a
    lexicographic sort prunes only its leading column.

    Each value scales linearly into a ``bits``-bit integer over its
    [min, max] range (value-based, not rank-based: no global sort or
    quantile pass — the min/max scalars come from a one-row aggregate the
    caller already has or computes cheaply), then the two coordinates'
    bits interleave. All pure Catalyst integer arithmetic; the interleave
    unrolls to 2×bits shift/mask terms inside one codegen stage.
    """
    def scaled(c, lo, hi):
        # bounds may be literals or (broadcast one-row) columns — exact
        # integer aggregates, so data-derived bounds stay deterministic
        from pyspark.sql import Column as _Col

        lo_l = (lo if isinstance(lo, _Col) else F.lit(lo)).cast("double")
        hi_l = (hi if isinstance(hi, _Col) else F.lit(hi)).cast("double")
        x = (c.cast("double") - lo_l) / (hi_l - lo_l)
        x = F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))
        return F.least(
            F.floor(x * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
        )

    xa = scaled(col_a, a_min, a_max)
    xb = scaled(col_b, b_min, b_max)
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xa, k).bitwiseAND(F.lit(1)), 2 * k + 1)
            + F.shiftleft(F.shiftright(xb, k).bitwiseAND(F.lit(1)), 2 * k)
        )
    return df.withColumn("zindex", z)


def hilbert_index(
    df: DataFrame,
    col_a,
    col_b,
    *,
    a_min,
    a_max,
    b_min,
    b_max,
    bits: int = 16,
) -> DataFrame:
    """Hilbert curve index over two dimensions — the better-locality
    sibling of ``zorder_index`` (public algorithm: the classic xy2d
    quadrant-rotation recurrence, e.g. Hamilton's compact Hilbert
    indices / the well-known Wikipedia formulation; independently
    implemented). Unlike Z-order, the Hilbert curve never makes the
    long diagonal jumps Morton interleaving takes between quadrant
    boundaries, so consecutive index ranges map to tighter spatial
    blocks — at 100 TB that is measurably better min/max file pruning
    for range predicates on either dimension (Delta added HILBERT
    clustering over ZORDER for exactly this reason).

    Values scale linearly into ``bits``-bit cells exactly as
    ``zorder_index`` does; the xy2d loop then runs as ONE higher-order
    ``aggregate`` fold over the bit levels with a (x, y, d) struct
    accumulator — a runtime loop, NOT an unrolled expression tree (16
    levels of inlined swap/reflect CASEs would grow the Catalyst tree
    exponentially). All integer bit math — engine- and
    partitioning-exact; the DuckDB oracle replays the identical levels
    as generated chained CTEs.
    """
    from pyspark.sql import Column as _Col

    def scaled(c, lo, hi):
        lo_l = (lo if isinstance(lo, _Col) else F.lit(lo)).cast("double")
        hi_l = (hi if isinstance(hi, _Col) else F.lit(hi)).cast("double")
        x = (c.cast("double") - lo_l) / (hi_l - lo_l)
        x = F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))
        return F.least(
            F.floor(x * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
        )

    n_1 = (1 << bits) - 1
    step = (
        "(acc, k) -> named_struct("
        # ry=0: reflect-if-rx then swap (x' = reflected y); ry=1: keep x
        f"'x', CASE WHEN (acc.y & shiftleft(CAST(1 AS BIGINT), k)) = 0 THEN "
        f"(CASE WHEN (acc.x & shiftleft(CAST(1 AS BIGINT), k)) != 0 "
        f"THEN {n_1}L - acc.y ELSE acc.y END) ELSE acc.x END, "
        f"'y', CASE WHEN (acc.y & shiftleft(CAST(1 AS BIGINT), k)) = 0 THEN "
        f"(CASE WHEN (acc.x & shiftleft(CAST(1 AS BIGINT), k)) != 0 "
        f"THEN {n_1}L - acc.x ELSE acc.x END) ELSE acc.y END, "
        # d += s*s * ((3*rx) XOR ry), spelled as the 4-way CASE so the
        # oracle can repeat it verbatim
        "'d', acc.d + shiftleft(CAST(1 AS BIGINT), 2 * k) * (CASE "
        "WHEN (acc.x & shiftleft(CAST(1 AS BIGINT), k)) = 0 "
        " AND (acc.y & shiftleft(CAST(1 AS BIGINT), k)) = 0 THEN 0L "
        "WHEN (acc.x & shiftleft(CAST(1 AS BIGINT), k)) = 0 THEN 1L "
        "WHEN (acc.y & shiftleft(CAST(1 AS BIGINT), k)) != 0 THEN 2L "
        "ELSE 3L END))"
    )
    fold = (
        f"aggregate(sequence({bits - 1}, 0, -1), "
        "named_struct('x', __ha, 'y', __hb, 'd', CAST(0 AS BIGINT)), "
        + step
        + ").d"
    )
    return (
        df.withColumn("__ha", scaled(col_a, a_min, a_max))
        .withColumn("__hb", scaled(col_b, b_min, b_max))
        .withColumn("hindex", F.expr(fold))
        .drop("__ha", "__hb")
    )


def compaction_plan_nfd(
    sizes: DataFrame,
    *,
    size_col: str = "s",
    key_col: str = "day",
    capacity_factor: int = 2,
) -> DataFrame:
    """Compaction planning for a file-per-partition table (the Iceberg/
    Delta `rewriteDataFiles` decision): pack per-partition file sizes
    into target files of capacity C = capacity_factor * max(size) using
    Next-Fit-Decreasing — items sorted (size DESC, key ASC), each
    appended to the current target file until it would overflow, then a
    new file opens. NFD is the one classical bin-packing heuristic
    whose state is a single (bin, load) pair, which makes the whole
    plan ONE sequential integer fold — bit-exact on any engine — while
    staying within 2x optimal (Johnson 1973). The DuckDB oracle replays
    the identical fold as a linear recursive CTE.

    Scale shape: the input collapses to one row per PARTITION (file)
    before planning — bounded by the partition count, not the corpus —
    so the bounded-fold contract (ses/holt/haar) applies; the plan
    itself is a driver-bounded artifact by nature (it is a list of
    rewrite tasks). Returns one row per planned target file:
    (bin, n_files, load, fill_ppm)."""
    items = sizes.agg(
        F.expr(
            f"array_sort(collect_list(struct({size_col} AS s,"
            f" {key_col} AS k)), (a, b) -> CASE"
            " WHEN a.s > b.s THEN -1 WHEN a.s < b.s THEN 1"
            " WHEN a.k < b.k THEN -1 WHEN a.k > b.k THEN 1 ELSE 0 END)"
        ).alias("items"),
        F.expr(f"{capacity_factor} * max({size_col})").alias("cap"),
    )
    folded = items.select(
        "items",
        "cap",
        F.expr(
            """aggregate(items,
                 struct(CAST(1 AS INT) AS bin, CAST(0 AS BIGINT) AS load,
                        CAST(array() AS array<int>) AS assigns),
                 (acc, it) -> if(acc.load + it.s <= cap,
                   struct(acc.bin AS bin,
                          acc.load + it.s AS load,
                          acc.assigns || array(acc.bin) AS assigns),
                   struct(CAST(acc.bin + 1 AS INT) AS bin,
                          CAST(it.s AS BIGINT) AS load,
                          acc.assigns || array(acc.bin + 1) AS assigns)))"""
        ).alias("st"),
    )
    per_item = folded.select(
        "cap",
        F.explode(F.arrays_zip(F.col("items"), F.col("st.assigns"))).alias("z"),
    ).select(
        "cap",
        F.col("z.items.s").alias("s"),
        F.col("z.assigns").alias("bin"),
    )
    return (
        per_item.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("s").alias("load"),
            F.first("cap").alias("cap"),
        )
        .select(
            "bin",
            F.col("n_files").cast("double").alias("n_files_d"),
            F.col("load").cast("double").alias("load_d"),
            F.expr("CAST(load * 1000000L div cap AS DOUBLE)").alias(
                "fill_ppm_d"
            ),
        )
    )
