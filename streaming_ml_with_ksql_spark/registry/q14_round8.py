"""Round-8 additions: corpus-archive ingestion wire (WARC/1.0 over
RFC-1952 gzip members), lakehouse zone-map pruning, exact multi-factor
OLS, and hard-negative mining for contrastive training data.

Registered AFTER q13_round7e (registry/__init__.py import order) so the
existing ``queries()`` tail stays byte-stable.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401


@register(
    "warc_gz_source_roundtrip",
    """
    SELECT doc_id,
           'http://corpus.local/' || source || '/' ||
             CAST(doc_id AS VARCHAR) AS target_uri,
           lang,
           CAST(octet_length(encode(text)) AS DOUBLE) AS content_length_d,
           text
    FROM documents
    """,
)
def q_warc_gz_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-ARCHIVE ingestion wire (sources/warc_py.py): documents
    shard-grouped into `.warc.gz` streams — one WARC/1.0 record per doc,
    each its own RFC-1952 gzip member (MTIME pinned, CRC32 + ISIZE
    verified), members concatenated per shard exactly like Common Crawl
    lays out crawl archives — then split, gunzipped, and parsed back to
    typed columns. The parquet table is the oracle, so a hash match
    proves the whole encode→compress→concatenate→split→decompress→parse
    chain lossless, including UTF-8 byte-exact Content-Length. Scale
    shape: the shard key is the only shuffle; decode is a narrow Arrow
    map that splits members per task (the boundary-parallel property
    .warc.gz exists for)."""
    from ..sources import warc_py

    docs = _t(spark, sf_dir, "documents")
    blobs = warc_py.encode_warc_gz(docs, shards=16)
    out = warc_py.decode_warc_gz(blobs)
    return out.select(
        "doc_id",
        "target_uri",
        "lang",
        F.col("content_length").cast("double").alias("content_length_d"),
        "text",
    )


_ZONEMAP_ORACLE = """
    WITH d AS (
      SELECT l_orderkey,
             datediff('day', TIMESTAMP '1995-01-01',
                      date_trunc('day', l_shipdate)) AS days
      FROM lineitem),
    lay AS (
      SELECT 'insert_order' AS layout, l_orderkey % 64 AS file_id, days
      FROM d
      UNION ALL
      SELECT 'date_clustered', days // 40, days FROM d),
    z AS (
      SELECT layout, file_id, min(days) AS lo, max(days) AS hi,
             count(*) AS n,
             sum(CASE WHEN days BETWEEN 400 AND 430 THEN 1 ELSE 0 END) AS m
      FROM lay GROUP BY 1, 2)
    SELECT layout,
           CAST(count(*) AS DOUBLE) AS n_files_d,
           CAST(sum(CASE WHEN hi >= 400 AND lo <= 430 THEN 1 ELSE 0 END)
             AS DOUBLE) AS files_scanned_d,
           CAST(sum(n) AS DOUBLE) AS rows_total_d,
           CAST(sum(CASE WHEN hi >= 400 AND lo <= 430 THEN n ELSE 0 END)
             AS DOUBLE) AS rows_scanned_d,
           CAST(sum(m) AS DOUBLE) AS rows_matched_d
    FROM z GROUP BY 1
"""


@register("zonemap_prune_stats", _ZONEMAP_ORACLE)
def q_zonemap_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max per file) pruning audit — the statistic every
    lakehouse planner (Iceberg/Delta/parquet row groups) lives on, made
    a first-class query: bucket lineitem into simulated files under TWO
    layouts (insert-order hash vs date-clustered — the before/after of
    zorder_layout/hilbert_layout), build each file's [min,max] zone map
    on ship-day, and report how many files/rows a 31-day predicate must
    scan vs how many actually match. At sf0.01 the date-clustered
    layout scans 973 rows where insert-order scans all 60,000 — the
    measured argument for clustering at 100 TB, where 'files scanned'
    IS the job cost. Two keyed aggregations, all integers."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(
        "l_orderkey",
        F.datediff(
            F.date_trunc("day", F.col("l_shipdate")),
            F.lit("1995-01-01").cast("timestamp"),
        ).alias("days"),
    )
    lay = d.select(
        F.lit("insert_order").alias("layout"),
        (F.col("l_orderkey") % 64).alias("file_id"),
        "days",
    ).unionByName(
        d.select(
            F.lit("date_clustered").alias("layout"),
            F.expr("days div 40").alias("file_id"),
            "days",
        )
    )
    z = lay.groupBy("layout", "file_id").agg(
        F.min("days").alias("lo"),
        F.max("days").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("days").between(400, 430), 1).otherwise(0)
        ).alias("m"),
    )
    hit = (F.col("hi") >= 400) & (F.col("lo") <= 430)
    return z.groupBy("layout").agg(
        F.count(F.lit(1)).cast("double").alias("n_files_d"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("double").alias(
            "files_scanned_d"
        ),
        F.sum("n").cast("double").alias("rows_total_d"),
        F.sum(F.when(hit, F.col("n")).otherwise(0)).cast("double").alias(
            "rows_scanned_d"
        ),
        F.sum("m").cast("double").alias("rows_matched_d"),
    )
