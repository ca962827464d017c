"""Per-event trailing time-window features (range-frame window aggregates).

The reference's training job computes, per user, trailing-600-second rolling
event-type counts *at every event* via pandas ``rolling("600s").sum()``
(reference: train.py:260-276). That per-event rolling feature is the batch
twin of the hopping window: same state, evaluated at event times instead of
grid times.

Spark expresses it as a range-frame window aggregate — pure JVM, one shuffle
on the partition key, no Python:

    Window.partitionBy(user).orderBy(unix_micros(ts)).rangeBetween(-600s, 0)

Scale notes:
- Range frames require a per-key sort; the shuffle is on user_id only, so
  1000 executors each sort their users independently. Skewed users are
  bounded by per-user event counts, not total volume.
- Frame bounds are in exact integer microseconds — no float time math.
- Bound semantics: inclusive [t-600s, t] (pandas' rolling uses (t-600s, t];
  divergence documented, both sides of the oracle use the inclusive form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import count_if

__all__ = ["rolling_counts", "lag_lead_features"]


def rolling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_seconds: int = 600,
    event_col: str = "event_type",
    event_types: tuple[str, ...] = ("view", "click", "purchase", "error"),
) -> DataFrame:
    """Trailing event-type counts per key at every event
    (reference: train.py:260-276)."""
    us = window_seconds * 1_000_000
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-us, 0)
    )
    out = events
    for et in event_types:
        ind = F.when(F.col(event_col) == F.lit(et), 1).otherwise(0)
        out = out.withColumn(f"{et}s_in_window", F.sum(ind).over(w).cast("int"))
    out = out.withColumn("events_in_window", F.count(F.lit(1)).over(w).cast("int"))
    return out.select(
        "event_id",
        key_col,
        ts_col,
        event_col,
        "events_in_window",
        *[f"{et}s_in_window" for et in event_types],
    )


def lag_lead_features(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    tiebreak: str = "event_id",
    value_col: str = "event_type",
) -> DataFrame:
    """Previous/next event context per key: lag/lead of the value column
    plus microseconds since the previous event. Absent from the reference
    surface (SURVEY.md §2.9 analytic window functions) but the Markov
    transition structure of its generator (generator.py:36-102 — from_state
    → to_state pairs) is exactly a lag over the event stream.

    Same single shuffle + per-key sort as rolling_counts; lag/lead reuse
    the one sorted pass.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    )
    return events.select(
        "event_id",
        key_col,
        ts_col,
        F.col(value_col),
        F.lag(value_col).over(w).alias("prev_value"),
        F.lead(value_col).over(w).alias("next_value"),
        # double, not long: the column is NULL for each key's first event,
        # and nullable integers degrade to float64 across the pandas bridge
        # on the oracle side — a double on both sides compares exactly.
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w)))
        .cast("double")
        .alias("us_since_prev"),
    )
