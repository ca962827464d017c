"""Join operators.

The reference's single join is a stream–table LEFT OUTER equi-join: each
windowed-aggregate row enriched with the latest ``users`` row for its key
(reference: README.md:56-58, 62-70). KSQL forces the user to pre-partition
both sides by the join key (the rekey at README.md:28); in Spark that
physical concern disappears — Catalyst shuffles on demand, and for a bounded
dimension table we broadcast instead, eliminating the shuffle entirely.

Scale notes:
- The dimension side of the enrich join is explicitly ``F.broadcast`` — at
  100 TB the fact side never shuffles for this join; each executor holds the
  (bounded) dimension hash map. This is strictly better than KSQL's
  repartition-topic round-trip through the broker.
- If the dimension outgrows broadcast (> ~1 GB), drop the hint and let AQE
  pick shuffled hash / sort-merge with skew-split — the API stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["enrich_left_join", "semi_join", "anti_join"]


def enrich_left_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream–table LEFT OUTER equi-join (reference: README.md:62-70 —
    ``aggregated_events_stream LEFT JOIN users ON ... = users.rowkey``).

    Unmatched fact rows keep NULL dimension columns, matching KSQL's
    left-join semantics. No pre-rekey needed (reference: README.md:28;
    SURVEY.md J2/J3) — broadcast replaces co-partitioning.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, facts[fact_key] == d[dim_key], "left")


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """EXISTS — keep left rows with a match (Spark gives this free;
    absent from the reference surface, SURVEY.md §2.9)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """NOT EXISTS — keep left rows with no match."""
    return left.join(right, on, "left_anti")
