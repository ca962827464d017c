"""Time-series operators: multi-resolution rollups and gap-filling.

The reference's windowed tables (reference: README.md:41-50) keep ONE
resolution per query; a metrics/hypertable workload materializes several
(minute → hour → day). These operators express that Spark-first:

- ``multi_resolution_rollup`` builds the coarser grains FROM the finer
  partials (sum-of-sums, min-of-mins), not from the raw table — one scan
  of the events feeds every resolution, and Catalyst's ReuseExchange
  dedups the shared minute-aggregate subplan across the union branches.
  At 100 TB this is the difference between one pass and three.
- ``gap_fill_locf`` densifies a sparse per-key series onto a regular
  bucket scaffold (``sequence`` + ``explode`` — generated, not joined
  from a calendar table) and forward-fills the last observation
  (``last(ignorenulls)`` over an ordered window). The scaffold is
  generated per key from its own [min, max] span, so no key pays for
  another key's history.

Cross-engine exactness: double sums are NOT associative, and the cascade
re-orders additions vs a direct group-by — so sums run in DECIMAL(18,6)
(exact, associative) and only the final value casts back to DOUBLE. The
DuckDB oracles aggregate straight from the raw table; the decimal path is
what makes cascade ≡ direct bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "multi_resolution_rollup",
    "minute_partials",
    "rollup_from_minute_partials",
    "gap_fill_locf",
    "zscore_outliers",
]

_DEC = "decimal(18,6)"


def minute_partials(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """The finest-grain partial table (minute, key) -> (count, decimal
    sum, min, max). ALL rollup state derives from this frame; it is the
    thing a hypertable materializes continuously — batch (one groupBy)
    or streaming (the identical aggregate in complete mode: counts/sums
    additive, min/max order-insensitive, so drained == batch exactly)."""
    ts, val = F.col(ts_col), F.col(value_col).cast(_DEC)
    return events.groupBy(
        F.date_trunc("minute", ts).alias("bucket_start"), key_col
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(val).alias("_sum"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def rollup_from_minute_partials(minute: DataFrame, *, key_col: str = "event_type") -> DataFrame:
    """Coarsen stored minute partials into the hour/day grains and union
    the three resolutions — never re-touching raw events (the 100 TB
    rollup contract: coarse grains are derived from persisted partials)."""

    def _coarsen(finer: DataFrame, grain: str) -> DataFrame:
        return finer.groupBy(
            F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start"),
            key_col,
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum").alias("_sum"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )

    hour = _coarsen(minute, "hour")
    day = _coarsen(hour, "day")

    def _finalize(df: DataFrame, resolution: str) -> DataFrame:
        return df.select(
            F.lit(resolution).alias("resolution"),
            "bucket_start",
            key_col,
            "n_events",
            F.col("_sum").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )

    return (
        _finalize(minute, "minute")
        .unionAll(_finalize(hour, "hour"))
        .unionAll(_finalize(day, "day"))
    )


def multi_resolution_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Minute/hour/day rollup of (count, sum, min, max) per key, coarser
    grains aggregated from the finer grain's partials. Output columns:
    resolution, bucket_start, <key>, n_events, sum_value, min_value,
    max_value."""
    return rollup_from_minute_partials(
        minute_partials(
            events, ts_col=ts_col, key_col=key_col, value_col=value_col
        ),
        key_col=key_col,
    )


def gap_fill_locf(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    grain: str = "hour",
) -> DataFrame:
    """Densify each key's series onto a regular ``grain`` scaffold over its
    own [min, max] bucket span; empty buckets get n_events=0 and the
    last-observed value carried forward (LOCF). ``order_col`` breaks
    within-bucket ties so "last observation" is deterministic.

    Output: <key>, bucket_start, n_events, sum_value, locf_value."""
    ts = F.col(ts_col)
    bucket = F.date_trunc(grain, ts)

    per_bucket = events.groupBy(
        F.col(key_col), bucket.alias("bucket_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(value_col).cast(_DEC)).cast("double").alias("sum_value"),
        F.max_by(
            F.col(value_col), F.struct(ts, F.col(order_col))
        ).alias("_last_obs"),
    )

    scaffold = (
        events.groupBy(key_col)
        .agg(
            F.min(bucket).alias("_mn"),
            F.max(bucket).alias("_mx"),
        )
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(_mn, _mx, interval 1 {grain})")
            ).alias("bucket_start"),
        )
    )

    filled = scaffold.join(per_bucket, [key_col, "bucket_start"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        key_col,
        "bucket_start",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        F.last("_last_obs", ignorenulls=True).over(w).alias("locf_value"),
    )


def zscore_outliers(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outlier flags — the numeric anomaly screen of a
    data-quality pipeline — from EXACT decimal moments: per-key count,
    sum, and sum-of-squares accumulate in DECIMAL (the inputs carry a
    fixed decimal scale, so the partials are exact in any order, on any
    engine), and mean/variance derive in double through ONE fixed
    expression shape (var = ss/n - mean*mean) that DuckDB restates
    verbatim — so the flagged set and each rounded z hash-check exactly.

    Shape: one scan feeds the tiny per-key moment table (map-side
    combined), which broadcast-joins back onto the events — the corpus
    never shuffles. Rounded-z thresholding keeps the boundary decision
    identical cross-engine.

    Zero-variance keys produce NO outlier rows: sd = 0 would make
    z = 0/0 = NaN, and both Spark and DuckDB order NaN above every
    double, so without the ``__sd > 0`` guard a constant-valued key —
    the least anomalous data possible — would flag every row (ADVICE
    r5). The guard is mirrored in the DuckDB oracle."""
    v = F.col(value_col).cast(_DEC)
    stats = (
        events.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(v).alias("__s"),
            F.sum(v * v).alias("__ss"),
        )
        .withColumn("__mean", F.col("__s").cast("double") / F.col("__n"))
        .withColumn(
            "__sd",
            F.sqrt(
                F.col("__ss").cast("double") / F.col("__n")
                - F.col("__mean") * F.col("__mean")
            ),
        )
        .filter(F.col("__sd") > 0)
        .select(key_col, "__mean", "__sd")
    )
    z = F.round((F.col(value_col) - F.col("__mean")) / F.col("__sd"), 6)
    return (
        events.join(F.broadcast(stats), key_col)
        .withColumn("z_score", z)
        .filter(F.abs(F.col("z_score")) >= threshold)
        .select(id_col, key_col, value_col, "z_score")
    )
