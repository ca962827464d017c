"""Windowed aggregation operators.

The reference's centerpiece is a hopping-window per-user aggregate
(reference: README.md:41-50 — ``WINDOW HOPPING (SIZE 10 MINUTES, ADVANCE BY
2 MINUTES) GROUP BY user_id`` with 4 conditional-count SUMs and
min/max ROWTIME rendered via TIMESTAMPTOSTRING). Spark's sliding
``F.window`` is the exact semantic twin: epoch-aligned window grid, each
event assigned to ``size/slide`` overlapping windows.

Scale notes:
- `F.window` expands each input row to size/slide rows *inside the same
  stage* (a generator in whole-stage codegen) and the aggregation is
  partial-aggregated map-side before the shuffle on (window, user_id) —
  so the shuffle carries one row per (user, window) per input partition,
  not 5× the raw events. This holds at 100 TB: state per key is bounded,
  and AQE coalesces the post-shuffle partitions.
- No Python crosses the row path; the whole plan is JVM/whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["count_if", "hopping_window_agg", "tumbling_window_agg", "session_window_agg"]


def count_if(cond: Column) -> Column:
    """``SUM(CASE WHEN cond THEN 1 ELSE 0 END)`` (reference: README.md:45-48)."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def hopping_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    size: str = "10 minutes",
    slide: str = "2 minutes",
    event_col: str = "event_type",
    event_types: tuple[str, ...] = ("view", "click", "purchase", "error"),
) -> DataFrame:
    """The flagship query: per-key hopping-window event-type counts.

    Mirrors reference README.md:41-50 on the driver's ``events`` table:
    one output row per (key, hopping window), with min/max event time both
    raw and ``HH:mm:ss``-formatted (TIMESTAMPTOSTRING parity, README.md:43-44)
    and one conditional count per event type (README.md:45-48).
    """
    win = F.window(F.col(ts_col), size, slide)
    aggs = [
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.date_format(F.min(ts_col), "HH:mm:ss").alias("first_event_time"),
        F.date_format(F.max(ts_col), "HH:mm:ss").alias("last_event_time"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    aggs += [
        count_if(F.col(event_col) == F.lit(et)).alias(f"{et}_count") for et in event_types
    ]
    out = events.groupBy(win.alias("w"), F.col(key_col)).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "first_ts",
        "last_ts",
        "first_event_time",
        "last_event_time",
        "n_events",
        *[f"{et}_count" for et in event_types],
    )


def tumbling_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    size: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window variant (KSQL supports it; the reference only declares
    HOPPING — SURVEY.md §2.9). Same shape, non-overlapping windows."""
    win = F.window(F.col(ts_col), size)
    return (
        events.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
            "first_ts",
            "last_ts",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows (gap-based). Not declared by the reference (SURVEY.md
    §2.9) but part of the KSQL window family; Spark's ``session_window``
    merges per-key events separated by < gap. Oracle-able via a
    lag/cum-sum sessionization in ANSI SQL."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col(key_col),
            F.col("first_ts"),
            F.col("last_ts"),
            F.col("n_events"),
        )
    )
