"""Round-7 continuation (fourth block): the columnar Arrow IPC wire
codec, hybrid-retrieval rank fusion, and the causal-inference family
opener (difference-in-differences).

Imported LAST from ``registry/__init__.py`` so the registration tail
order of all earlier queries is untouched.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401
from ..operators import text as text_ops


@register(
    "arrow_ipc_source_roundtrip",
    """
    SELECT event_id, ts, CAST(user_id AS DOUBLE) AS user_id_d,
           event_type, value, props
    FROM events
    """,
)
def q_arrow_ipc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COLUMNAR wire-format family member
    (sources/arrow_ipc.py — Arrow IPC streaming format, the encoding
    Spark itself speaks on every executor<->Python Arrow hop and the
    payload of Arrow Flight feeds): events encode batch-at-a-time into
    self-contained IPC streams (schema message + record batch + EOS)
    under an explicit declared schema, and decode back to typed columns
    with schema validation per payload. The parquet table is the
    oracle, so a hash match proves the round-trip lossless — including
    nullable user_id null bitmaps and double bit-exactness through the
    columnar buffers. Payload framing (one per Arrow batch) varies with
    partitioning; the decoded ROWS, which the oracle hashes, do not.

    Reference analog: the Connect value-converter seam
    (`infra/connect/mysql-source.json:4-19`) — this is the converter a
    columnar topic would declare."""
    from ..sources import arrow_ipc

    ddl = (
        "event_id bigint, ts_micros bigint, user_id bigint,"
        " event_type string, value double, props string"
    )
    ev = _t(spark, sf_dir, "events")
    wire_in = ev.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_micros"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    decoded = arrow_ipc.decode_arrow_ipc(
        arrow_ipc.encode_arrow_ipc(wire_in, ddl), ddl
    )
    return decoded.select(
        "event_id",
        F.timestamp_micros(F.col("ts_micros")).alias("ts"),
        F.col("user_id").cast("double").alias("user_id_d"),
        "event_type",
        "value",
        "props",
    )


_HASH_TERM = (
    "('0x' || substr(md5({t}), 1, 7))::UBIGINT::BIGINT % 64"
)
_SIGN_TERM = (
    "CASE WHEN ('0x' || substr(md5({t}), 8, 1))::UBIGINT::BIGINT % 2 = 0"
    " THEN 1 ELSE -1 END"
)

_RRF_ORACLE = rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents),
    base AS (SELECT doc_id, t, len(t) AS dl FROM d),
    per AS (
      SELECT doc_id, dl, term,
             len(list_filter(t, x -> x = term)) AS tf
      FROM base CROSS JOIN (SELECT unnest(['spark','window','join']) AS term)),
    lex AS (SELECT doc_id, sum(tf) AS tot, any_value(dl) AS dl
            FROM per WHERE tf > 0 GROUP BY doc_id),
    lexr AS (
      SELECT doc_id, row_number()
               OVER (ORDER BY tot DESC, dl ASC, doc_id ASC) AS r
      FROM lex QUALIFY r <= 20),
    toks AS (SELECT doc_id, unnest(t) AS tok FROM d),
    hb AS (
      SELECT doc_id, {_HASH_TERM.format(t='tok')} AS bucket,
             {_SIGN_TERM.format(t='tok')} AS s
      FROM toks WHERE len(tok) > 0),
    pb AS (SELECT doc_id, bucket, sum(s) AS w FROM hb GROUP BY 1, 2),
    q AS (
      SELECT {_HASH_TERM.format(t='term')} AS bucket,
             {_SIGN_TERM.format(t='term')} AS qs
      FROM (SELECT unnest(['spark','window','join']) AS term)),
    sem AS (
      SELECT pb.doc_id, sum(q.qs * pb.w) AS score
      FROM pb JOIN q USING (bucket) GROUP BY 1),
    semr AS (
      SELECT doc_id, row_number()
               OVER (ORDER BY score DESC, doc_id ASC) AS r
      FROM sem QUALIFY r <= 20),
    fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             l.r AS r_lex, s.r AS r_sem,
             coalesce(1000000 // (60 + l.r), 0)
               + coalesce(1000000 // (60 + s.r), 0) AS rrf
      FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
    SELECT doc_id,
           CAST(r_lex AS DOUBLE) AS r_lex_d,
           CAST(r_sem AS DOUBLE) AS r_sem_d,
           CAST(rrf AS DOUBLE) AS rrf_micro_d,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rnk
    FROM fused QUALIFY rnk <= 10
"""


@register("rrf_hybrid_retrieval", _RRF_ORACLE)
def q_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (text.rrf_hybrid_topk):
    a lexical term-frequency ranking and an integer hash-embedding dot
    product ranking, each truncated to its top-20 with
    TakeOrderedAndProject, fused by 1e6 div (60 + rank) integer
    micro-unit RRF — the BM25+dense first stage of a RAG serving path,
    made bit-exact by keeping every score an integer."""
    return text_ops.rrf_hybrid_topk(_t(spark, sf_dir, "documents"))


_DID_ORACLE = """
    WITH x AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
             CASE WHEN l.l_shipdate >= TIMESTAMP '1995-07-01 00:00:00'
                  THEN 1 ELSE 0 END AS post,
             CAST(floor((l.l_extendedprice
                         * (CAST(1 AS DOUBLE) - l.l_discount))
                        * CAST(1000000 AS DOUBLE)) AS BIGINT) AS micro
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    c AS (SELECT treated, post, sum(micro) AS s, count(*) AS n
          FROM x GROUP BY 1, 2),
    w AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
        max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
        max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
        max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
        max(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
        max(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11,
        max(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00,
        max(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01
      FROM c),
    m AS (
      SELECT n10, n11, n00, n01,
        CASE WHEN n10 > 0 THEN CAST(s10 AS DOUBLE) / n10 END AS m10,
        CASE WHEN n11 > 0 THEN CAST(s11 AS DOUBLE) / n11 END AS m11,
        CASE WHEN n00 > 0 THEN CAST(s00 AS DOUBLE) / n00 END AS m00,
        CASE WHEN n01 > 0 THEN CAST(s01 AS DOUBLE) / n01 END AS m01
      FROM w)
    SELECT CAST(n10 AS DOUBLE) AS n_treated_pre_d,
           CAST(n11 AS DOUBLE) AS n_treated_post_d,
           CAST(n00 AS DOUBLE) AS n_control_pre_d,
           CAST(n01 AS DOUBLE) AS n_control_post_d,
           m10 AS mean_treated_pre_d, m11 AS mean_treated_post_d,
           m00 AS mean_control_pre_d, m01 AS mean_control_post_d,
           (m11 - m10) - (m01 - m00) AS did_micro_d
    FROM m
"""


@register("did_promo_effect", _DID_ORACLE)
def q_did_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the causal-inference family opener:
    the promo-part 'treatment' cohort vs everything else, before/after
    the 1995-07-01 policy date, outcome = discounted revenue per
    lineitem in exact integer micro-units. The 2x2 cell sums are BIGINT
    (order- and partitioning-free), each cell mean is ONE
    correctly-rounded division, and the DiD estimate is three exact
    subtractions of those identically-rounded doubles — so the whole
    causal contrast is bit-identical cross-engine with no round()
    anywhere. ANSI-guard: every mean is CASE-gated on its cell count
    (an empty cell yields NULL, not a divide-by-zero crash).

    Scale shape: one fact-dim join (shuffle on partkey, AQE-eligible),
    one map-side-combinable 4-cell aggregate, then driver-side
    arithmetic on 8 numbers."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    x = li.join(part, li.l_partkey == part.p_partkey).select(
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("treated"),
        F.when(
            F.col("l_shipdate") >= F.lit("1995-07-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.expr(
            "CAST(floor((l_extendedprice"
            " * (CAST(1 AS DOUBLE) - l_discount))"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("micro"),
    )
    c = x.groupBy("treated", "post").agg(
        F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n")
    )

    def cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    w = c.agg(
        cell(1, 0, "n").alias("n10"),
        cell(1, 1, "n").alias("n11"),
        cell(0, 0, "n").alias("n00"),
        cell(0, 1, "n").alias("n01"),
        cell(1, 0, "s").alias("s10"),
        cell(1, 1, "s").alias("s11"),
        cell(0, 0, "s").alias("s00"),
        cell(0, 1, "s").alias("s01"),
    )

    def mean(s: str, n: str):
        return F.when(
            F.col(n) > 0, F.col(s).cast("double") / F.col(n)
        )

    m = w.select(
        "n10", "n11", "n00", "n01",
        mean("s10", "n10").alias("m10"),
        mean("s11", "n11").alias("m11"),
        mean("s00", "n00").alias("m00"),
        mean("s01", "n01").alias("m01"),
    )
    return m.select(
        F.col("n10").cast("double").alias("n_treated_pre_d"),
        F.col("n11").cast("double").alias("n_treated_post_d"),
        F.col("n00").cast("double").alias("n_control_pre_d"),
        F.col("n01").cast("double").alias("n_control_post_d"),
        F.col("m10").alias("mean_treated_pre_d"),
        F.col("m11").alias("mean_treated_post_d"),
        F.col("m00").alias("mean_control_pre_d"),
        F.col("m01").alias("mean_control_post_d"),
        ((F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))).alias(
            "did_micro_d"
        ),
    )
