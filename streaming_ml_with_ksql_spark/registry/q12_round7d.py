"""Round-7 continuation (fourth block): the columnar Arrow IPC wire
codec; hybrid retrieval (RRF fusion + greedy MMR diversification);
difference-in-differences and exact Shapley attribution; integer
fixed-point HITS; exact DTW alignment; the KMV cardinality sketch and
its streaming twin; half-life decay; JL projection; RAKE keyphrases;
FIFO lot allocation; the t-closeness privacy screen; and the G.711
mu-law codec. Later waves continue in q13_round7e (split at the
~2,500-LoC module guideline).

Imported after q11 from ``registry/__init__.py``, preserving the
global registration order.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401
from ..operators import text as text_ops
from .q04_streamksql import _STREAM_SEQ, _replay_events  # noqa: F401


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


def _hits_oracle(rounds: int = 2) -> str:
    """Unrolled integer fixed-point HITS (the pagerank-oracle idiom):
    each round is a sum-aggregate CTE plus a 1-row rescale divisor CTE,
    generated per round so the oracle replays graph.hits_bipartite's
    BIGINT arithmetic verbatim."""
    sql = """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS hs FROM e)"""
    prev_h = "h0"
    for k in range(1, rounds + 1):
        sql += f""",
    a{k}raw AS (SELECT p, sum(hs) AS s FROM e JOIN {prev_h} USING (c)
                GROUP BY p),
    a{k}d AS (SELECT greatest(CAST(1 AS BIGINT),
                              (max(s) + 999999) // 1000000) AS d
              FROM a{k}raw),
    a{k} AS (SELECT p, s // d AS sc FROM a{k}raw, a{k}d),
    h{k}raw AS (SELECT c, sum(sc) AS s
                FROM e JOIN a{k} USING (p) GROUP BY c),
    h{k}d AS (SELECT greatest(CAST(1 AS BIGINT),
                              (max(s) + 999999) // 1000000) AS d
              FROM h{k}raw),
    h{k} AS (SELECT c, s // d AS hs FROM h{k}raw, h{k}d)"""
        prev_h = f"h{k}"
    sql += f""",
    ta AS (
      SELECT 'authority' AS kind, p AS node_id, sc,
             CAST(row_number() OVER (ORDER BY sc DESC, p ASC) AS INT) AS rnk
      FROM a{rounds} QUALIFY rnk <= 10),
    th AS (
      SELECT 'hub' AS kind, c AS node_id, hs AS sc,
             CAST(row_number() OVER (ORDER BY hs DESC, c ASC) AS INT) AS rnk
      FROM h{rounds} QUALIFY rnk <= 10)
    SELECT kind, node_id, CAST(sc AS DOUBLE) AS score_d, rnk FROM ta
    UNION ALL
    SELECT kind, node_id, CAST(sc AS DOUBLE) AS score_d, rnk FROM th"""
    return sql


@register("hits_customer_part", _hits_oracle(2))
def q_hits_customer_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the bipartite customer->part purchase graph
    (operators/graph.py hits_bipartite): hub customers (broad,
    authority-heavy baskets) and authority parts (bought by the hubbest
    customers), two fixed-point rounds, every score a BIGINT — the
    mutual-reinforcement ranking that complements pagerank_near_dup's
    single-mode walk. Top-10 per side via TakeOrderedAndProject with
    rank attached on the 10-row results."""
    from ..operators import graph as graph_ops

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        # hits_bipartite materializes its (projected) edge input itself
        # (ADVICE r14) before the sizing count and the per-round joins /
        # kernel scans, so no caller-side checkpoint is needed here.
    )
    hubs, auths = graph_ops.hits_bipartite(edges, rounds=2)

    def side(df: DataFrame, id_col: str, score_col: str, kind: str) -> DataFrame:
        top = df.orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        ).limit(10)
        return (
            top.coalesce(1)
            .sortWithinPartitions(F.col(score_col).desc(), F.col(id_col).asc())
            .select(
                F.lit(kind).alias("kind"),
                F.col(id_col).alias("node_id"),
                F.col(score_col).cast("double").alias("score_d"),
                (F.monotonically_increasing_id() + 1).cast("int").alias("rnk"),
            )
        )

    return side(auths, "p", "as_", "authority").unionByName(
        side(hubs, "c", "hs", "hub")
    )


_HALFLIFE_ORACLE = """
    WITH mx AS (SELECT date_trunc('day', max(ts)) AS m FROM events),
    x AS (
      SELECT user_id,
             CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT) AS micro,
             CAST(datediff('day', date_trunc('day', ts), m) AS BIGINT) // 7
               AS w
      FROM events, mx
      WHERE user_id IS NOT NULL AND value IS NOT NULL AND value >= 0),
    d AS (
      SELECT user_id, sum(micro) AS raw,
             sum(CASE WHEN w < 63
                      THEN micro // (CAST(1 AS BIGINT) << CAST(w AS INT))
                      ELSE 0 END) AS decayed
      FROM x GROUP BY 1)
    SELECT user_id, CAST(raw AS DOUBLE) AS raw_micro_d,
           CAST(decayed AS DOUBLE) AS decayed_micro_d
    FROM d
"""


@register("halflife_decayed_value", _HALFLIFE_ORACLE)
def q_halflife_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement with a one-week half-life, EXACTLY:
    each event's value (integer micro-units) is divided by 2^age_weeks
    via a power-of-two integer division (a bit shift both engines
    evaluate identically), then summed per user — the decayed-count
    feature of every churn/propensity model, with zero pow()/exp() so
    the decay is bit-exact on any engine and partitioning. Ages beyond
    63 half-lives clamp to 0 (shift-width guard); values are pinned
    non-negative so floor-division semantics never diverge. Scale
    shape: one 1-row max broadcast, one map-side-combinable per-user
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.date_trunc("day", F.max("ts")).alias("m"))
    x = (
        ev.crossJoin(F.broadcast(mx))
        .where(
            F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & (F.col("value") >= 0)
        )
        .select(
            "user_id",
            F.expr(
                "CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT)"
            ).alias("micro"),
            F.expr(
                "CAST(datediff(date_trunc('day', m),"
                " date_trunc('day', ts)) AS BIGINT) div 7"
            ).alias("w"),
        )
    )
    return (
        x.groupBy("user_id")
        .agg(
            F.sum("micro").alias("raw"),
            F.sum(
                F.expr(
                    "CASE WHEN w < 63"
                    " THEN micro div shiftleft(CAST(1 AS BIGINT),"
                    " CAST(w AS INT)) ELSE 0 END"
                )
            ).alias("decayed"),
        )
        .select(
            "user_id",
            F.col("raw").cast("double").alias("raw_micro_d"),
            F.col("decayed").cast("double").alias("decayed_micro_d"),
        )
    )


def _dtw_oracle(m: int = 28) -> str:
    """Unrolled min-plus-scan DTW (timeseries.dtw_cost docstring): row i
    is three generated CTEs — cost prefix sums S, the shifted-min term
    b[k] = min(prev[k], prev[k-1]) - S[k-1], and the scan
    cur[j] = S[j] + min(b[1..j]) — all BIGINT list arithmetic, so the
    oracle replays the Spark fold's integers verbatim."""
    sql = f"""
    WITH daily AS (
      SELECT datediff('day', TIMESTAMP '1992-01-01',
                      date_trunc('day', o_orderdate)) AS t,
             (sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000) AS x
      FROM orders GROUP BY 1),
    first2m AS (
      SELECT t, x FROM daily QUALIFY row_number() OVER (ORDER BY t) <= {2 * m}),
    l0 AS (SELECT list(x ORDER BY t) AS zs FROM first2m),
    s AS (SELECT zs[1:{m}] AS xs, zs[{m + 1}:{2 * m}] AS ys FROM l0),
    d1 AS (
      SELECT xs, ys,
             list_transform(range(1, {m + 1}), j ->
               list_sum(list_transform(range(1, j + 1),
                 k -> abs(xs[1] - ys[k])))) AS cur
      FROM s)"""
    for i in range(2, m + 1):
        sql += f""",
    e{i} AS (
      SELECT xs, ys, cur,
             list_transform(range(1, {m + 1}), j ->
               list_sum(list_transform(range(1, j + 1),
                 k -> abs(xs[{i}] - ys[k])))) AS S
      FROM d{i - 1}),
    f{i} AS (
      SELECT xs, ys, S,
             list_transform(range(1, {m + 1}), k ->
               (CASE WHEN k = 1 THEN cur[1]
                     ELSE least(cur[k], cur[k - 1]) END)
               - CASE WHEN k > 1 THEN S[k - 1] ELSE 0 END) AS bv
      FROM e{i}),
    d{i} AS (
      SELECT xs, ys,
             list_transform(range(1, {m + 1}), j ->
               S[j] + list_aggregate(bv[1:j], 'min')) AS cur
      FROM f{i})"""
    sql += f"""
    SELECT CAST(cur[{m}] AS DOUBLE) AS dtw_cost_d,
           CAST(list_sum(list_transform(range(1, {m + 1}),
                  j -> abs(xs[j] - ys[j]))) AS DOUBLE) AS l1_cost_d,
           CAST(list_sum(list_transform(range(1, {m + 1}),
                  j -> abs(xs[j] - ys[j]))) - cur[{m}] AS DOUBLE)
             AS warp_gain_d
    FROM d{m}"""
    return sql


@register("dtw_revenue_align", _dtw_oracle(28))
def q_dtw_revenue_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer DTW alignment (timeseries.dtw_cost) of two
    consecutive 28-day daily-revenue windows — "how much does this
    month's shape match last month's, allowing tempo warp?" — the
    alignment-distance family member next to the fixed-lag
    autocorrelation and the pattern z-match: dtw_cost_d is the DP
    corner, l1_cost_d the no-warp diagonal baseline, warp_gain_d their
    gap (always >= 0; how much alignment the warp buys). The series
    fold input is one bounded 56-element list (the ses/holt/haar
    contract); the DP is m chained one-row projections, each a
    sequential BIGINT fold."""
    from ..operators import timeseries as ts_ops

    orders = _t(spark, sf_dir, "orders")
    m = 28
    daily = orders.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("o_orderdate")),
            F.lit("1992-01-01").cast("timestamp"),
        ).alias("t")
    ).agg(
        F.expr("sum(CAST(floor(o_totalprice) AS BIGINT)) div 1000L").alias("x")
    )
    ser = daily.agg(
        F.expr(
            f"slice(transform(array_sort(collect_list(struct(t, x))),"
            f" e -> e.x), 1, {2 * m})"
        ).alias("zs")
    ).select(
        F.expr(f"slice(zs, 1, {m})").alias("xs"),
        F.expr(f"slice(zs, {m + 1}, {m})").alias("ys"),
    )
    out = ts_ops.dtw_cost(ser, m=m)
    return out.select(
        F.col("dtw").cast("double").alias("dtw_cost_d"),
        F.col("l1").cast("double").alias("l1_cost_d"),
        (F.col("l1") - F.col("dtw")).cast("double").alias("warp_gain_d"),
    )


_KMV_ORACLE = """
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL),
    dh AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 7))
               ::UBIGINT::BIGINT % 268435456 AS h
      FROM du),
    rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM dh QUALIFY rn <= 64),
    sk AS (SELECT event_type, max(h) AS kth, count(*) AS m FROM rk GROUP BY 1),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_n
           FROM events WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT e.event_type,
           CAST(CASE WHEN s.m < 64 THEN s.m
                     ELSE (CAST(63 AS BIGINT) * 268435456) // greatest(s.kth, 1) END
                AS DOUBLE) AS kmv_estimate_d,
           CAST(e.exact_n AS DOUBLE) AS exact_distinct_d,
           CAST(s.kth AS DOUBLE) AS kth_hash_d
    FROM ex e JOIN sk s USING (event_type)
"""


@register("kmv_distinct_users", _KMV_ORACLE)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type
    (Bar-Yossef et al., RANDOM 2002) — the mergeable cardinality sketch
    family member next to hll_registers_exact, made EXACTLY oracle-able
    because the 'random' hash is the deterministic md5-bucket idiom:
    estimate = (k-1) * 2^28 div h_(k) over the k=64 smallest distinct
    28-bit hashes (exact count when a group has fewer than k). The
    exact distinct count rides along, so the sketch's error is itself
    hash-checked. Scale shape: two sparse distincts shuffled on
    (type, key), then a PARTITIONED rank window (per-group, never
    global) over at most |distinct hashes| rows; the div is guarded
    against a zero k-th hash (ANSI)."""
    ev = _t(spark, sf_dir, "events")
    du = (
        ev.where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 268435456
    )
    dh = du.select("event_type", h.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    rk = dh.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 64)
    sk = rk.groupBy("event_type").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("m")
    )
    ex = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_n"))
    )
    return ex.join(sk, "event_type").select(
        "event_type",
        F.expr(
            "CAST(CASE WHEN m < 64 THEN m"
            " ELSE (63 * 268435456L) div greatest(kth, 1L) END AS DOUBLE)"
        ).alias("kmv_estimate_d"),
        F.col("exact_n").cast("double").alias("exact_distinct_d"),
        F.col("kth").cast("double").alias("kth_hash_d"),
    )


def _jl_signs(out_dim: int = 16, in_dim: int = 64) -> list[list[int]]:
    """Deterministic Rademacher (+-1) JL projection matrix: sign(j,i)
    from the first md5 nibble of 'jl:{j}:{i}' — the content-free
    md5-randomness idiom (no RNG in any plan; both engines consume the
    identical literal matrix)."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0] in "01234567"
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


_JL_SIGNS = _jl_signs()


def _jl_oracle() -> str:
    signs_sql = (
        "["
        + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in _JL_SIGNS)
        + "]"
    )
    return f"""
    WITH gs AS (
      SELECT max(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))))) / 127 AS gscale
      FROM embeddings),
    q8 AS (
      SELECT vec_id, label,
             CASE WHEN gscale = 0
               THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
               ELSE list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) / gscale + 0.5)
                                AS BIGINT))
             END AS q
      FROM embeddings, gs),
    m AS (SELECT {signs_sql}::BIGINT[][] AS signs)
    SELECT vec_id, label,
           array_to_string(
             list_transform(range(1, 17), j ->
               list_sum(list_transform(range(1, 65),
                 i -> signs[j][i] * q[i]))), ',') AS jl_codes
    FROM q8, m
"""


@register("jl_projection_embed", _jl_oracle())
def q_jl_projection_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64d -> 16d (Achlioptas,
    JCSS 2003: Rademacher +-1 entries suffice) over GLOBALLY-scaled
    int8 codes: one corpus-wide scale (a 1-row broadcast, unlike
    embedding_quantize_int8's per-vector scale) keeps every projected
    coordinate an exact BIGINT sum of signed codes, so the 4x
    dimensionality reduction — the cheap pre-filter in front of exact
    cosine rerank at 100 TB — is bit-exact on any engine and
    partitioning. The +-1 matrix is a deterministic md5 literal shared
    by both plans; distance distortion vs the unprojected codes is
    pinned in tests. Narrow per-row array arithmetic; no shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    gs = emb.agg(
        (
            F.max(
                F.array_max(
                    F.transform(
                        F.col("embedding"), lambda x: F.abs(x.cast("double"))
                    )
                )
            )
            / F.lit(127)
        ).alias("gscale")
    )
    q8 = emb.crossJoin(F.broadcast(gs)).select(
        "vec_id",
        "label",
        F.when(
            F.col("gscale") == 0,
            F.transform(F.col("embedding"), lambda x: F.lit(0).cast("long")),
        )
        .otherwise(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    x.cast("double") / F.col("gscale") + F.lit(0.5)
                ).cast("long"),
            )
        )
        .alias("q"),
    )
    # r12 perf: the former aggregate-lambda form inlined the 16x64 signs
    # literal INSIDE the fold, so codegen rebuilt the nested array per
    # element (~1024 array materializations per row — 12 s for 5k rows
    # at sf0.1 in the block sweep). Unroll each projected coordinate as
    # one +-element_at sum: pure whole-stage-codegen arithmetic, zero
    # array construction, byte-identical output.
    coord_exprs = [
        "0L " + " ".join(
            f"{'+' if v > 0 else '-'} element_at(q, {i + 1})"
            for i, v in enumerate(row)
        )
        for row in _JL_SIGNS
    ]
    proj = F.array(*[F.expr(e) for e in coord_exprs])
    return q8.select(
        "vec_id",
        "label",
        F.array_join(proj, ",").alias("jl_codes"),
    )


def _mmr_oracle(cand_n: int = 20, k: int = 8) -> str:
    """Relationally-unrolled greedy MMR (similarity.mmr_diverse_topk):
    per pick, a (cand x picked) max-redundancy aggregate and a
    QUALIFY-argmax — all BIGINT dot products over globally-scaled int8
    codes, replaying the Spark loop's integers verbatim. The chain
    CTEs are AS MATERIALIZED: each s{{t}} is referenced three times by
    round t+1, so inlining re-evaluates the whole prefix exponentially
    (~3^k scans — measured minutes at k=8; materialized: 0.08 s)."""
    idot = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
    sql = f"""
    WITH gs AS (
      SELECT max(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))))) / 127 AS gscale
      FROM embeddings),
    q8 AS (
      SELECT vec_id,
             CASE WHEN gscale = 0
               THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
               ELSE list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) / gscale + 0.5)
                                AS BIGINT))
             END AS q
      FROM embeddings, gs),
    qv AS (SELECT q AS qq FROM q8 WHERE vec_id = 0),
    rel AS (
      SELECT vec_id, q, {idot.format(a='q', b='qq')} AS rel
      FROM q8, qv WHERE vec_id != 0),
    cand AS MATERIALIZED (
      SELECT vec_id, q, rel FROM rel
      QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= {cand_n}),
    s1 AS MATERIALIZED (
      SELECT vec_id, q, rel, rel AS score, 1 AS pick_order FROM cand
      QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) = 1)"""
    for t in range(2, k + 1):
        sql += f""",
    p{t} AS (
      SELECT c.vec_id, max({idot.format(a='c.q', b='s.q')}) AS pen
      FROM cand c, s{t - 1} s
      WHERE c.vec_id NOT IN (SELECT vec_id FROM s{t - 1})
      GROUP BY 1),
    n{t} AS (
      SELECT c.vec_id, c.q, c.rel, c.rel - p.pen AS score,
             {t} AS pick_order
      FROM cand c JOIN p{t} p USING (vec_id)
      QUALIFY row_number() OVER (ORDER BY score DESC, c.vec_id) = 1),
    s{t} AS MATERIALIZED (SELECT * FROM s{t - 1} UNION ALL SELECT * FROM n{t})"""
    sql += f"""
    SELECT pick_order, vec_id, CAST(rel AS DOUBLE) AS rel_d,
           CAST(score AS DOUBLE) AS score_d
    FROM s{k}"""
    return sql


@register("mmr_diverse_retrieval", _mmr_oracle())
def q_mmr_diverse_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking of the top-20 integer-cosine candidates
    for query vector 0 (similarity.mmr_diverse_topk): eight greedy
    picks, each maximizing relevance minus worst redundancy against the
    picked set — the context-diversification stage of a RAG pipeline,
    exactly oracle-able because every score is a BIGINT dot product
    over globally-scaled int8 codes."""
    from ..operators import similarity as sim_ops

    return sim_ops.mmr_diverse_topk(_t(spark, sf_dir, "embeddings"))


def _rake_oracle() -> str:
    from ..operators.text import RAKE_STOPWORDS

    pat = r"\b(?:" + "|".join(RAKE_STOPWORDS) + r")\b"
    return rf"""
    WITH seg AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '{pat}')) AS rawseg
      FROM documents),
    ph AS (
      SELECT doc_id,
             regexp_replace(trim(rawseg), '\s+', ' ', 'g') AS phrase
      FROM seg),
    phl AS (
      SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS plen
      FROM ph WHERE len(phrase) > 0),
    cand AS (SELECT * FROM phl WHERE plen <= 4),
    pw AS (
      SELECT doc_id, plen, unnest(string_split(phrase, ' ')) AS word
      FROM cand),
    wsc AS (
      SELECT doc_id, word,
             (sum(plen) * CAST(1000000 AS BIGINT)) // count(*) AS wscore
      FROM pw GROUP BY 1, 2),
    dp AS (SELECT DISTINCT doc_id, phrase, plen FROM cand),
    dpw AS (
      SELECT doc_id, phrase, plen,
             unnest(string_split(phrase, ' ')) AS word
      FROM dp),
    ps AS (
      SELECT d.doc_id, d.phrase, any_value(d.plen) AS n_words,
             sum(w.wscore) AS score_micro
      FROM dpw d JOIN wsc w USING (doc_id, word)
      GROUP BY 1, 2)
    SELECT doc_id, phrase, CAST(n_words AS INT) AS n_words,
           CAST(score_micro AS DOUBLE) AS score_micro_d,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score_micro DESC, phrase ASC) AS INT) AS rnk
    FROM ps
    QUALIFY rnk <= 3
"""


@register("rake_keyphrases", _rake_oracle())
def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 RAKE keyphrases per document (text.rake_keyphrases):
    stopword-delimited candidate phrases, deg/freq word scores in
    integer micro-units, phrase score = sum of word scores — the
    zero-model keyword extractor beside tf-idf/BM25. Integer scoring
    end-to-end; per-document rank windows only."""
    from ..operators import text as t_ops

    return t_ops.rake_keyphrases(_t(spark, sf_dir, "documents"))


_FIFO_ORACLE = """
    WITH rl AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             l_returnflag = 'R' AS is_ret,
             sum(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY 1, 2, 3, 4, 5),
    rcpt AS (
      SELECT l_partkey, l_orderkey, l_linenumber, qty,
             sum(qty) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS cum
      FROM rl WHERE NOT is_ret),
    ret AS (
      SELECT l_partkey, l_orderkey, l_linenumber, qty,
             sum(qty) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS cum
      FROM rl WHERE is_ret),
    alloc AS (
      SELECT r.l_partkey,
             t.l_orderkey AS ret_orderkey, t.l_linenumber AS ret_linenumber,
             r.l_orderkey AS rcpt_orderkey, r.l_linenumber AS rcpt_linenumber,
             least(r.cum, t.cum)
               - greatest(r.cum - r.qty, t.cum - t.qty) AS alloc_qty
      FROM rcpt r JOIN ret t ON r.l_partkey = t.l_partkey
        AND r.cum > t.cum - t.qty AND t.cum > r.cum - r.qty)
    SELECT l_partkey, ret_orderkey, ret_linenumber,
           rcpt_orderkey, rcpt_linenumber,
           CAST(alloc_qty AS DOUBLE) AS alloc_qty_d
    FROM alloc WHERE alloc_qty > 0
"""


@register("fifo_lot_allocation", _FIFO_ORACLE)
def q_fifo_lot_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation — the inventory-accounting matcher: every
    returned lineitem ('R' flag) consumes the part's earliest receipts
    first, expressed as the INTERVAL-OVERLAP identity on per-part
    cumulative-quantity axes (receipt lot [cum-qty, cum) x return
    demand [cum-qty, cum): the overlap length IS the FIFO-allocated
    quantity — no loop, no state machine). Quantities are integral
    doubles cast to BIGINT, so every boundary and allocation is exact.

    Scale shape: the cumulative windows partition BY PART (no global
    sort); the overlap join is equi on l_partkey with range predicates
    AQE can treat as a co-partitioned join — per-part row counts are
    bounded (TPC-H ~30 lineitems/part at any SF), so the per-key
    overlap fan-out is a small constant."""
    li = _t(spark, sf_dir, "lineitem")

    # Pre-aggregate duplicate (part, order, line, date) rows into ONE
    # lot: this testdata's (l_orderkey, l_linenumber) is NOT unique
    # across rounds (reuse_distance_histogram found that the hard way),
    # and a tie in the cumulative window's ordering keys would make the
    # per-row cums nondeterministic (Spark ROWS frame) AND diverge from
    # DuckDB's RANGE default. After grouping, the ordering key is
    # unique by construction on both sides.
    rl = li.groupBy(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        (F.col("l_returnflag") == "R").alias("is_ret"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))

    def cum(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "qty",
            F.sum("qty").over(w).alias("cum"),
        )

    rcpt = cum(rl.where(~F.col("is_ret"))).alias("r")
    ret = cum(rl.where(F.col("is_ret"))).alias("t")
    joined = rcpt.join(
        ret,
        (F.col("r.l_partkey") == F.col("t.l_partkey"))
        & (F.col("r.cum") > F.col("t.cum") - F.col("t.qty"))
        & (F.col("t.cum") > F.col("r.cum") - F.col("r.qty")),
    )
    alloc = joined.select(
        F.col("r.l_partkey").alias("l_partkey"),
        F.col("t.l_orderkey").alias("ret_orderkey"),
        F.col("t.l_linenumber").alias("ret_linenumber"),
        F.col("r.l_orderkey").alias("rcpt_orderkey"),
        F.col("r.l_linenumber").alias("rcpt_linenumber"),
        (
            F.least(F.col("r.cum"), F.col("t.cum"))
            - F.greatest(
                F.col("r.cum") - F.col("r.qty"),
                F.col("t.cum") - F.col("t.qty"),
            )
        ).alias("alloc_qty"),
    )
    return alloc.where(F.col("alloc_qty") > 0).select(
        "l_partkey",
        "ret_orderkey",
        "ret_linenumber",
        "rcpt_orderkey",
        "rcpt_linenumber",
        F.col("alloc_qty").cast("double").alias("alloc_qty_d"),
    )


_KMV_STREAM_ORACLE = """
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL),
    dh AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 7))
               ::UBIGINT::BIGINT % 268435456 AS h
      FROM du),
    rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM dh QUALIFY rn <= 64),
    sk AS (SELECT event_type, max(h) AS kth, count(*) AS m FROM rk GROUP BY 1)
    SELECT event_type,
           CAST(m AS DOUBLE) AS m_d,
           CAST(kth AS DOUBLE) AS kth_hash_d,
           CAST(CASE WHEN m < 64 THEN m
                     ELSE (CAST(63 AS BIGINT) * 268435456)
                          // greatest(kth, 1) END
                AS DOUBLE) AS kmv_estimate_d
    FROM sk
"""


@register("streaming_kmv_ingest", _KMV_STREAM_ORACLE)
def q_streaming_kmv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV sketch maintained CONTINUOUSLY
    (streaming/stateful.py kmv_stream): per event type, an
    applyInPandasWithState machine keeps the k=64 smallest distinct
    md5 hashes (O(k) state per key, the sketch's whole point), emits
    its updated estimate every micro-batch through the file-replay
    harness, and the LAST emission per key — min-k of a union is
    batching-insensitive — equals the batch sketch EXACTLY, so the
    batch oracle applies verbatim. Streaming twin #10, completing the
    cardinality family (HLL registers hold the register view; KMV the
    mergeable-sample view)."""
    stream = _replay_events(spark, sf_dir)
    drained = stream_sinks.run_to_memory(
        stream_stateful.kmv_stream(stream),
        f"kmv_stream_{next(_STREAM_SEQ)}",
    )
    w = Window.partitionBy("event_type").orderBy(F.col("seq").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("m").cast("double").alias("m_d"),
            F.col("kth").cast("double").alias("kth_hash_d"),
            F.col("est").cast("double").alias("kmv_estimate_d"),
        )
    )


_SHAPLEY_CHANNELS = ("click", "error", "signup", "view")
# |S|!(n-1-|S|)! for n=4 players: denominator 4! = 24
_SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}


def _shapley_exprs() -> tuple[list[str], list[str]]:
    """Generated integer Shapley arithmetic over the 16 touchset-mask
    counts: v(S) = sum of subset-mask counts; phi_c x 24 = sum over
    coalitions S not containing c of w(|S|) * (v(S+c) - v(S)).
    Returns (per-channel phi expressions, per-channel touched-count
    expressions), each in terms of columns cnt_0..cnt_15."""
    def v(s: int) -> str:
        return "(" + " + ".join(
            f"cnt_{m}" for m in range(16) if (m & s) == m
        ) + ")"

    phis, touched = [], []
    for c in range(4):
        bit = 1 << c
        terms = []
        for s in range(16):
            if s & bit:
                continue
            w = _SHAPLEY_W[bin(s).count("1")]
            terms.append(f"{w} * ({v(s | bit)} - {v(s)})")
        phis.append(" + ".join(terms))
        touched.append(
            "(" + " + ".join(f"cnt_{m}" for m in range(16) if m & bit) + ")"
        )
    return phis, touched


def _shapley_oracle() -> str:
    chans = _SHAPLEY_CHANNELS
    bits = " + ".join(
        f"max(CASE WHEN e.event_type = '{ch}' THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(chans)
    )
    cnts = ", ".join(
        f"sum(CASE WHEN mask = {m} THEN 1 ELSE 0 END) AS cnt_{m}"
        for m in range(16)
    )
    phis, touched = _shapley_exprs()
    rows = ", ".join(
        f"('{ch}', CAST({phis[i]} AS DOUBLE), CAST({touched[i]} AS DOUBLE))"
        for i, ch in enumerate(chans)
    )
    return f"""
    WITH fp AS (
      SELECT user_id, min(ts) AS pts FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY 1),
    tmask AS (
      SELECT f.user_id, coalesce({bits}, 0) AS mask
      FROM fp f LEFT JOIN events e
        ON e.user_id = f.user_id AND e.ts < f.pts
        AND e.event_type IN ('click', 'error', 'signup', 'view')
      GROUP BY 1),
    cnt AS (SELECT {cnts} FROM tmask),
    out AS (
      SELECT unnest([{rows}], recursive := false) AS r FROM cnt)
    SELECT r[1]::VARCHAR AS channel,
           r[2]::DOUBLE AS shapley_x24_d,
           r[3]::DOUBLE AS touched_conversions_d
    FROM out
"""


@register("shapley_channel_attribution", _shapley_oracle())
def q_shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution (Shapley 1953; the
    marketing formulation of Zhao et al. 2018) over the four
    pre-purchase channels: the population characteristic function
    v(S) = conversions whose touchset is covered by coalition S, and
    each channel's Shapley value enumerated over all 16 coalitions with
    the 4-player factorial weights — kept integer by scaling by 4! = 24
    (phi x 24 is a BIGINT; no division anywhere), so the 'fair' credit
    split that last-touch/linear attribution (touch_attribution)
    approximates is itself bit-exact and oracle-checked.

    Scale shape: one first-purchase aggregate, one pre-purchase
    interval semi-join shuffled on user, a 16-cell mask histogram, and
    then pure literal arithmetic on ONE row — the coalition enumeration
    costs nothing at any corpus size because it happens after the
    16-cell collapse."""
    ev = _t(spark, sf_dir, "events")
    fp = (
        ev.where(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    chans = _SHAPLEY_CHANNELS
    touch = ev.where(F.col("event_type").isin(*chans)).select(
        F.col("user_id").alias("tu"), "ts", "event_type"
    )
    bits = sum(
        (
            F.max(
                F.when(F.col("event_type") == ch, F.lit(1 << i)).otherwise(0)
            )
            for i, ch in enumerate(chans)
        ),
        start=F.lit(0),
    )
    tmask = (
        fp.join(
            touch,
            (F.col("tu") == F.col("user_id")) & (F.col("ts") < F.col("pts")),
            "left",
        )
        .groupBy("user_id")
        .agg(F.coalesce(bits, F.lit(0)).alias("mask"))
    )
    cnt = tmask.agg(
        *[
            F.sum(F.when(F.col("mask") == m, 1).otherwise(0)).alias(f"cnt_{m}")
            for m in range(16)
        ]
    )
    phis, touched = _shapley_exprs()
    stack = ", ".join(
        f"'{ch}', CAST({phis[i]} AS DOUBLE), CAST({touched[i]} AS DOUBLE)"
        for i, ch in enumerate(chans)
    )
    return cnt.select(
        F.expr(
            f"stack(4, {stack}) AS"
            " (channel, shapley_x24_d, touched_conversions_d)"
        )
    )


_TCLOSE_ORACLE = """
    WITH gall AS (
      SELECT lang, count(*) AS b FROM documents GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM documents),
    grp AS (
      SELECT source, count(*) AS ng FROM documents GROUP BY 1),
    cell AS (
      SELECT source, lang, count(*) AS a FROM documents GROUP BY 1, 2),
    diff AS (
      SELECT g.source,
             abs(coalesce(c.a, 0) * t.n - gl.b * g.ng) AS num_v
      FROM grp g
      CROSS JOIN gall gl
      CROSS JOIN tot t
      LEFT JOIN cell c ON c.source = g.source AND c.lang = gl.lang),
    agg AS (
      SELECT d.source, any_value(g.ng) AS ng, any_value(t.n) AS n,
             sum(d.num_v) AS num
      FROM diff d JOIN grp g USING (source) CROSS JOIN tot t
      GROUP BY 1)
    SELECT source,
           CAST(ng AS DOUBLE) AS n_group_d,
           CAST(num AS DOUBLE) AS tvd_num_d,
           CAST(num AS DOUBLE)
             / (2 * CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)) AS tvd_d,
           CAST(CASE WHEN CAST(num AS DOUBLE)
                  / (2 * CAST(ng AS DOUBLE) * CAST(n AS DOUBLE))
                  > CAST(0.3 AS DOUBLE) THEN 1 ELSE 0 END AS INT) AS breach
    FROM agg
"""


@register("t_closeness_report", _TCLOSE_ORACLE)
def q_t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) — the third
    member of the privacy-screen trio (k_anonymity_report,
    l_diversity_report): per quasi-identifier group (source), the total
    variation distance between the group's sensitive-attribute (lang)
    distribution and the global one. The EMD-for-categorical TVD is
    computed by INTEGER cross-multiplication — num = sum over values of
    |a_v * N - b_v * n_g| (a BIGINT, partitioning-free) — and the final
    tvd = num / (2 n_g N) is ONE correctly-rounded division, so the
    screen and its breach flag (t = 0.3) are bit-exact. Scale shape:
    three small aggregates; the per-(group x value) grid is
    |QI| x |values| — dictionary-sized, broadcast-joined."""
    docs = _t(spark, sf_dir, "documents")
    glob = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("b"))
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    grp = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ng"))
    cell = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("a"))
    diff = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["source", "lang"], "left")
        .select(
            "source",
            "ng",
            "n",
            F.abs(
                F.coalesce(F.col("a"), F.lit(0)) * F.col("n")
                - F.col("b") * F.col("ng")
            ).alias("num_v"),
        )
    )
    agg = diff.groupBy("source").agg(
        F.first("ng").alias("ng"),
        F.first("n").alias("n"),
        F.sum("num_v").alias("num"),
    )
    tvd = F.col("num").cast("double") / (
        F.lit(2) * F.col("ng").cast("double") * F.col("n").cast("double")
    )
    return agg.select(
        "source",
        F.col("ng").cast("double").alias("n_group_d"),
        F.col("num").cast("double").alias("tvd_num_d"),
        tvd.alias("tvd_d"),
        F.when(tvd > F.lit(0.3).cast("double"), 1)
        .otherwise(0)
        .cast("int")
        .alias("breach"),
    )


_MULAW_ORACLE = """
    WITH n AS (
      SELECT doc_id, CAST(160 + doc_id % 241 AS INT) AS n_samples
      FROM documents),
    g AS (
      SELECT doc_id, n_samples,
             unnest(generate_series(0, n_samples - 1)) AS i
      FROM n),
    pcm AS (
      SELECT doc_id, n_samples,
             ((doc_id * 37 + i * 101) % 65536) - 32768 AS s
      FROM g),
    enc AS (
      SELECT doc_id, n_samples, s,
             CASE WHEN s < 0 THEN 128 ELSE 0 END AS sgn,
             least(abs(s), 32635) + 132 AS m
      FROM pcm),
    seg AS (
      SELECT *, CASE WHEN m < 256 THEN 0 WHEN m < 512 THEN 1
                     WHEN m < 1024 THEN 2 WHEN m < 2048 THEN 3
                     WHEN m < 4096 THEN 4 WHEN m < 8192 THEN 5
                     WHEN m < 16384 THEN 6 ELSE 7 END AS e
      FROM enc),
    cod AS (
      SELECT doc_id, n_samples, s, e,
             (m // (CAST(1 AS BIGINT) << CAST(e + 3 AS INT))) % 16 AS man,
             255 - (sgn + e * 16
                    + (m // (CAST(1 AS BIGINT) << CAST(e + 3 AS INT))) % 16)
               AS code,
             sgn
      FROM seg),
    rec AS (
      SELECT doc_id, n_samples, s, code,
             CASE WHEN sgn = 128 THEN -((man * 8 + 132)
                    * (CAST(1 AS BIGINT) << CAST(e AS INT)) - 132)
                  ELSE (man * 8 + 132)
                    * (CAST(1 AS BIGINT) << CAST(e AS INT)) - 132
             END AS r
      FROM cod)
    SELECT doc_id, any_value(n_samples) AS n_samples,
           CAST(sum(abs(s - r)) AS DOUBLE) AS sum_abs_err_d,
           CAST(max(abs(s - r)) AS DOUBLE) AS max_err_d,
           CAST(sum(code) AS DOUBLE) AS sum_code_d,
           'g711-mulaw' AS decoder
    FROM rec GROUP BY doc_id
"""


@register("multimodal_mulaw_transcode", _MULAW_ORACLE)
def q_multimodal_mulaw_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 mu-law companding round-trip over per-document PCM frames
    (operators/multimodal.py mulaw_transcode — the telephony 2:1 audio
    codec, joining WAV/BMP/PNG/JPEG/GIF/MP4/MJPG as a REAL in-repo
    codec): the oracle replays the segmented quasi-log curve
    analytically (bias 0x84, exponent CASE ladder, 4-bit mantissa, ones'
    complement as 255-x), so ONE wrong code or reconstruction anywhere
    in the frame breaks the hash. Everything is integer; errors are
    exact."""
    from ..operators import multimodal as mm

    out = mm.mulaw_transcode(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_samples",
        F.col("sum_abs_err").cast("double").alias("sum_abs_err_d"),
        F.col("max_err").cast("double").alias("max_err_d"),
        F.col("sum_code").cast("double").alias("sum_code_d"),
        "decoder",
    )
