"""Exact frequency-threshold heavy hitters with per-partition pre-pruning.

The naive plan for "keys with count >= s" shuffles EVERY key's partials —
at 100 TB the long tail (keys seen a handful of times) dominates the
exchange while contributing nothing to the answer. The two-phase shape
here prunes the tail before it ever shuffles:

  Phase 1 (candidates, narrow): count keys inside each input partition
  (Arrow `mapInPandas`, one vectorized value_counts per batch — no
  shuffle) and emit only keys with per-partition count >= ceil(s / P).
  Pigeonhole guarantees NO FALSE NEGATIVES: a key with global count >= s
  spread over P partitions must reach s/P in at least one of them.

  Phase 2 (verify, tiny): distinct the candidate keys (a shuffle of the
  few survivors), broadcast them, semi-join the raw rows, and take EXACT
  counts of candidates only — the one real groupBy touches a vanishing
  fraction of the data.

The result is exactly `GROUP BY key HAVING count(*) >= s` (which is what
the DuckDB oracle states), at the exchange cost of the heavy keys alone.
This is the deterministic, exactness-preserving cousin of count-min /
SpaceSaving sketch top-k (Misra-Gries style per-partition thresholds).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

__all__ = ["heavy_hitters"]


def heavy_hitters(df: DataFrame, key_col: str, *, min_count: int) -> DataFrame:
    """Exact (key, n) for every key occurring at least ``min_count`` times."""
    # Partition count is driver-side metadata (no job); the per-partition
    # threshold must use the REAL partition count — fewer partitions only
    # raises the bar correctness allows, more would break the pigeonhole.
    num_parts = max(df.rdd.getNumPartitions(), 1)
    local_min = math.ceil(min_count / num_parts)
    key_field = df.schema[key_col]
    cand_schema = StructType([StructField(key_col, key_field.dataType)])

    def local_candidates(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            c = pdf[key_col].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is not None:
            hot = counts[counts >= local_min]
            yield pd.DataFrame({key_col: hot.index.to_numpy()})

    candidates = (
        df.select(key_col).mapInPandas(local_candidates, cand_schema).distinct()
    )
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
