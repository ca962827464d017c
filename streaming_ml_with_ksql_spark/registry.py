"""Query registry: the single source of truth binding each implemented
operator (SURVEY.md §2 inventory + north-star extensions) to

  (a) a PySpark query  ``(spark, sf_dir) -> DataFrame``  and
  (b) an equivalent ANSI-SQL oracle string for DuckDB (or None for
      genuinely non-SQL-expressible ops → rows-only check).

``__spark_entry__.py`` exposes this registry through the driver contract.
Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import io as io_mod
from .operators import windows

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QueryDef(name=name, spark=fn, oracle=oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: qd.spark for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return io_mod.load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: hopping-window per-user aggregate (W1, W2, A1-A4, P3, P4, P7)
# Reference: README.md:41-50.
# --------------------------------------------------------------------------

# DuckDB has no hopping-window builtin; the oracle expands each event into
# its size/slide = 5 overlapping epoch-aligned windows (the same grid Spark's
# F.window uses: window_start = floor(epoch/slide)*slide - i*slide, i in 0..4)
# and then group-by's. Integer microsecond arithmetic avoids float drift.
_HOPPING_ORACLE = """
WITH hop AS (SELECT unnest(generate_series(0, 4)) AS i),
exp AS (
  SELECT
    e.*,
    make_timestamp((epoch_us(e.ts) // 120000000) * 120000000 - h.i * 120000000)
      AS window_start
  FROM events e CROSS JOIN hop h
)
SELECT
  window_start,
  window_start + INTERVAL 10 MINUTE AS window_end,
  user_id,
  min(ts) AS first_ts,
  max(ts) AS last_ts,
  strftime(min(ts), '%H:%M:%S') AS first_event_time,
  strftime(max(ts), '%H:%M:%S') AS last_event_time,
  count(*) AS n_events,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_count,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
FROM exp
GROUP BY window_start, user_id
"""


@register("hopping_window_agg", _HOPPING_ORACLE)
def q_hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.hopping_window_agg(_t(spark, sf_dir, "events"))


_TUMBLING_ORACLE = """
SELECT
  make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS window_start,
  make_timestamp((epoch_us(ts) // 600000000) * 600000000) + INTERVAL 10 MINUTE
    AS window_end,
  user_id,
  count(*) AS n_events,
  sum(value) AS sum_value,
  min(ts) AS first_ts,
  max(ts) AS last_ts
FROM events
GROUP BY 1, 2, 3
"""


@register("tumbling_window_agg", _TUMBLING_ORACLE)
def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling_window_agg(_t(spark, sf_dir, "events"))
