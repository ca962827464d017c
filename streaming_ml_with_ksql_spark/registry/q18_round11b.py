"""Round-11 wave 3: nonparametric two-sample testing (Mann-Whitney U
with tie-corrected z), skip-gram training-pair generation (the word2vec
data op), a Kaplan-Meier conversion-survival curve (new sequential
PRODUCT-fold idiom over a sorted bounded list), the event-type
user-set Jaccard overlap matrix, and a streaming CUSUM ingest twin.

Discipline as established elsewhere in the registry: integer (cents /
ppm / rank-algebra) arithmetic everywhere a hash must match; float ops
only as correctly-rounded +,-,*,/,sqrt chains whose expression strings
are shared VERBATIM between the Spark query and the DuckDB oracle (the
anova_value_by_type lesson). All five queries carry exact oracles.

Reference parity: the reference exposes grouped aggregation and UDF
scoring over streams (/root/reference/README.md:27-70); these are the
training-data/eval extensions the brief mandates beyond that surface.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401
from ..streaming import sinks as stream_sinks

# --------------------------------------------------------------------------
# Mann-Whitney U (weekend vs weekday value) with tie-corrected z
# --------------------------------------------------------------------------

# Final scalar chains, shared VERBATIM by both engines (every operand is
# an exact integer; each /,*,sqrt is one correctly-rounded double op —
# identical bit-for-bit cross-engine). u2 = 2*U (doubled rank-sum form,
# integer-exact with average-rank ties); vard = Var[U] with the standard
# tie correction.
_MW_VARD = (
    "(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / CAST(12 AS DOUBLE))"
    " * ((CAST(n AS DOUBLE) + CAST(1 AS DOUBLE))"
    " - CAST(tie3 AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))))"
)
_MW_RB = (
    "CASE WHEN n1 > 0 AND n0 > 0 THEN"
    " CAST(u2 AS DOUBLE) / CAST(n1 * n0 AS DOUBLE) - CAST(1 AS DOUBLE)"
    " ELSE NULL END"
)
_MW_Z = (
    "CASE WHEN vard > CAST(0 AS DOUBLE) THEN"
    " (CAST(u2 AS DOUBLE) - CAST(n1 * n0 AS DOUBLE))"
    " / (CAST(2 AS DOUBLE) * sqrt(vard)) ELSE NULL END"
)

_MW_ORACLE = f"""
    WITH t AS (
      SELECT CAST(floor(value * 10) AS BIGINT) AS s,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT s, sum(wk) AS n1c, count(*) AS tc FROM t GROUP BY 1),
    wb AS (
      SELECT c.s, c.n1c, c.tc, coalesce(sum(c2.tc), 0) AS before
      FROM cells c LEFT JOIN cells c2 ON c2.s < c.s
      GROUP BY c.s, c.n1c, c.tc),
    agg AS (
      SELECT sum(n1c) AS n1, sum(tc - n1c) AS n0, sum(tc) AS n,
             sum(n1c * (2 * before + tc + 1)) AS ranksum2,
             sum(CAST(tc * tc * tc - tc AS DECIMAL(38,0))) AS tie3
      FROM wb),
    u AS (
      SELECT n1, n0, n, tie3, ranksum2 - n1 * (n1 + 1) AS u2,
             {_MW_VARD} AS vard
      FROM agg)
    SELECT CAST(n1 AS DOUBLE) AS n_weekend_d,
           CAST(n0 AS DOUBLE) AS n_weekday_d,
           CAST(u2 AS DOUBLE) AS u2_d,
           {_MW_RB} AS rank_biserial,
           {_MW_Z} AS z_value
    FROM u
"""


@register("mann_whitney_weekend_value", _MW_ORACLE)
def q_mann_whitney_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U test of the weekend effect on event
    value — the rank-based (distribution-free) location test next to
    the KS / Wasserstein / randomization drift screens on the same
    split. Over the bounded deci-quantized value-cell histogram (the
    roc_auc rank-sum idiom): doubled rank-sum with average-rank ties,
    tie-correction term Sum(t^3 - t) accumulated in DECIMAL(38,0) so a
    pathological one-cell corpus cannot overflow under ANSI, U / the
    rank-biserial effect size / the tie-corrected z emitted from one
    shared verbatim expression chain. Prefix ranks via the O(C^2)
    broadcast self-join — no global sort, one corpus scan; weekend
    predicate stated per engine (DuckDB dayofweek 0/6, Spark 1/7)."""
    ev = _t(spark, sf_dir, "events")
    t = ev.filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value") * 10).cast("long").alias("s"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
    )
    cells = t.groupBy("s").agg(
        F.sum("wk").alias("n1c"), F.count(F.lit(1)).alias("tc")
    )
    c2 = cells.select(F.col("s").alias("s2"), F.col("tc").alias("tc2"))
    wb = (
        cells.join(F.broadcast(c2), F.col("s2") < F.col("s"), "left")
        .groupBy("s", "n1c", "tc")
        .agg(F.coalesce(F.sum("tc2"), F.lit(0)).alias("before"))
    )
    agg = wb.agg(
        F.sum("n1c").alias("n1"),
        F.sum(F.col("tc") - F.col("n1c")).alias("n0"),
        F.sum("tc").alias("n"),
        F.sum(
            F.col("n1c") * (2 * F.col("before") + F.col("tc") + 1)
        ).alias("ranksum2"),
        F.sum(
            F.expr("CAST(tc * tc * tc - tc AS DECIMAL(38,0))")
        ).alias("tie3"),
    )
    u = agg.selectExpr(
        "n1", "n0", "n", "tie3",
        "ranksum2 - n1 * (n1 + 1) AS u2",
        f"{_MW_VARD} AS vard",
    )
    return u.selectExpr(
        "CAST(n1 AS DOUBLE) AS n_weekend_d",
        "CAST(n0 AS DOUBLE) AS n_weekday_d",
        "CAST(u2 AS DOUBLE) AS u2_d",
        f"{_MW_RB} AS rank_biserial",
        f"{_MW_Z} AS z_value",
    )


# --------------------------------------------------------------------------
# Skip-gram (center, context) training pairs — the word2vec data op
# --------------------------------------------------------------------------

_SKIPGRAM_ORACLE = r"""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents),
    pr AS (
      SELECT unnest(flatten(list_transform(t, (x, i) ->
        list_filter(list_transform([-2, -1, 1, 2], o ->
          CASE WHEN i + o BETWEEN 1 AND len(t)
               THEN struct_pack(center := x, context := t[i + o]) END),
          s -> s IS NOT NULL)))) AS p
      FROM toks),
    c AS (SELECT p.center AS center, p.context AS context, count(*) AS n
          FROM pr GROUP BY 1, 2)
    SELECT center, context, CAST(n AS DOUBLE) AS n_d FROM c
    QUALIFY row_number() OVER (ORDER BY n DESC, center ASC, context ASC)
      <= 100
"""


@register("skipgram_training_pairs", _SKIPGRAM_ORACLE)
def q_skipgram_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair extraction with a symmetric
    window of 2 — the word2vec / embedding-pretraining data generator —
    reported as the top-100 pair histogram with a full deterministic
    tiebreak. Pairs are generated ROW-LOCALLY by one nested array
    lambda over the token array (4 offsets per token, bounds-checked) —
    no positional self-join, so there is no per-document quadratic
    blowup and the stage is linear in corpus tokens and entirely
    JVM-side; only (pair, count) rows shuffle into the global top-k
    (TakeOrderedAndProject, no single-partition window). Spark array
    lambdas index 0-based with 1-based element_at; DuckDB list lambdas
    index 1-based — the offset predicate is stated per engine so the
    emitted pair multiset is identical."""
    docs = _t(spark, sf_dir, "documents")
    toks = text.tokens_col(F.col("text"))
    pairs = docs.select(toks.alias("t")).select(
        F.explode(
            F.expr(
                "flatten(transform(t, (x, i) ->"
                " filter(transform(array(-2, -1, 1, 2), o ->"
                " CASE WHEN i + 1 + o BETWEEN 1 AND size(t)"
                " THEN struct(x AS center, element_at(t, i + 1 + o)"
                " AS context) END), s -> s IS NOT NULL)))"
            )
        ).alias("p")
    )
    c = (
        pairs.select(F.col("p.center").alias("center"),
                     F.col("p.context").alias("context"))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        c.orderBy(F.col("n").desc(), F.col("center").asc(),
                  F.col("context").asc())
        .limit(100)
        .select("center", "context", F.col("n").cast("double").alias("n_d"))
    )


# --------------------------------------------------------------------------
# Kaplan-Meier conversion-survival curve (sequential product fold)
# --------------------------------------------------------------------------

_KM_ORACLE = """
    WITH first_seen AS (
      SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id),
    first_buy AS (
      SELECT user_id, min(ts) AS tb FROM events
      WHERE event_type = 'purchase' GROUP BY user_id),
    lab AS (
      SELECT f.user_id,
             CASE WHEN b.tb IS NOT NULL AND
                  (epoch_us(date_trunc('hour', b.tb))
                   - epoch_us(date_trunc('hour', f.t0))) // 3600000000
                  <= 72
                  THEN (epoch_us(date_trunc('hour', b.tb))
                        - epoch_us(date_trunc('hour', f.t0))) // 3600000000
                  ELSE 72 END AS dur,
             CASE WHEN b.tb IS NOT NULL AND
                  (epoch_us(date_trunc('hour', b.tb))
                   - epoch_us(date_trunc('hour', f.t0))) // 3600000000
                  <= 72
                  THEN 1 ELSE 0 END AS ev
      FROM first_seen f LEFT JOIN first_buy b USING (user_id)),
    g AS (SELECT dur, count(*) AS n_total, sum(ev) AS d FROM lab
          GROUP BY dur),
    r AS (
      SELECT g.dur, g.d, g.n_total - g.d AS c_cens, sum(g2.n_total) AS n_risk
      FROM g JOIN g g2 ON g2.dur >= g.dur
      GROUP BY g.dur, g.d, g.n_total),
    ls AS (
      SELECT list_sort(list(struct_pack(dur := dur,
               f := CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))))
             AS l
      FROM r)
    SELECT CAST(r.dur AS DOUBLE) AS dur_d,
           CAST(r.n_risk AS DOUBLE) AS n_risk_d,
           CAST(r.d AS DOUBLE) AS d_conv_d,
           CAST(r.c_cens AS DOUBLE) AS c_cens_d,
           list_reduce(list_prepend(CAST(1 AS DOUBLE),
             list_transform(list_filter((SELECT l FROM ls),
               x -> x.dur <= r.dur), x -> x.f)),
             (a, b) -> a * b) AS survival
    FROM r
"""


@register("kaplan_meier_conversion", _KM_ORACLE)
def q_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of hours-to-first-purchase per user
    with administrative right-censoring at 72 h (non-converters within
    the window are censored, not events) — the estimator behind
    conversion-latency SLAs, complementing user_life_table's discrete
    hazard with the cumulative product S(t) = prod_{dur<=t}
    (n_risk - d)/n_risk. NEW IDIOM — sequential product fold: each KM
    factor is ONE correctly-rounded division of exact integers, and the
    cumulative product folds over the SORTED duration list in a defined
    left-to-right order (Spark F.aggregate over sort_array, DuckDB
    list_reduce over list_sort with a prepended 1.0) — double
    multiplication is correctly rounded, so the fold hash-matches
    cross-engine exactly where a groupBy product never could. The
    corpus collapses to one row per user, then to <=73 hour cells; the
    at-risk suffix sum is the bounded O(C^2) broadcast self-join;
    hour deltas via the hour-truncated epoch-microsecond idiom
    (nonnegative numerator, so Spark div == DuckDB //). Non-degenerate
    at sf0.01: 56 cells, 127 conversions, 23 censored."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    first_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tb"))
    )
    hour_delta = (
        "(unix_micros(date_trunc('hour', tb))"
        " - unix_micros(date_trunc('hour', t0))) div 3600000000"
    )
    lab = first_seen.join(first_buy, "user_id", "left").selectExpr(
        f"CASE WHEN tb IS NOT NULL AND {hour_delta} <= 72"
        f" THEN {hour_delta} ELSE 72 END AS dur",
        f"CASE WHEN tb IS NOT NULL AND {hour_delta} <= 72"
        " THEN 1 ELSE 0 END AS ev",
    )
    g = lab.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("ev").alias("d")
    )
    g2 = g.select(F.col("dur").alias("dur2"), F.col("n_total").alias("nt2"))
    r = (
        g.join(F.broadcast(g2), F.col("dur2") >= F.col("dur"))
        .groupBy("dur", "d", "n_total")
        .agg(F.sum("nt2").alias("n_risk"))
        .select(
            "dur", "d", (F.col("n_total") - F.col("d")).alias("c_cens"),
            "n_risk",
        )
    )
    ls = r.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("dur"),
                    (
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk").cast("double")
                    ).alias("f"),
                )
            )
        ).alias("l")
    )
    return r.crossJoin(F.broadcast(ls)).select(
        F.col("dur").cast("double").alias("dur_d"),
        F.col("n_risk").cast("double").alias("n_risk_d"),
        F.col("d").cast("double").alias("d_conv_d"),
        F.col("c_cens").cast("double").alias("c_cens_d"),
        F.expr(
            "aggregate(filter(l, x -> x.dur <= dur),"
            " CAST(1 AS DOUBLE), (a, x) -> a * x.f)"
        ).alias("survival"),
    )


# --------------------------------------------------------------------------
# Event-type user-set Jaccard overlap matrix
# --------------------------------------------------------------------------

_TYPE_JACCARD_ORACLE = """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    per AS (SELECT event_type, count(*) AS nu FROM d GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_inter
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT i.type_a, i.type_b,
           CAST(pa.nu AS DOUBLE) AS n_a_d,
           CAST(pb.nu AS DOUBLE) AS n_b_d,
           CAST(i.n_inter AS DOUBLE) AS n_inter_d,
           CAST((i.n_inter * 1000000)
                // (pa.nu + pb.nu - i.n_inter) AS DOUBLE) AS jaccard_ppm_d
    FROM inter i
    JOIN per pa ON pa.event_type = i.type_a
    JOIN per pb ON pb.event_type = i.type_b
"""


@register("event_type_user_jaccard", _TYPE_JACCARD_ORACLE)
def q_event_type_user_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact Jaccard similarity of the USER
    SETS behind each event-type pair (do clickers and purchasers
    overlap?), in integer ppm. The corpus collapses to the distinct
    (type, user) frame in one scan; the intersection is a self
    equi-join on user_id (linear — each user contributes at most
    |types|^2/2 pairs, types literal-bounded at 5), and the 5-row
    per-type cardinalities broadcast onto the 10-row pair frame.
    Union via |A|+|B|-|A∩B| — no second pass. The set-overlap
    companion to user_event_type_diversity (per-user entropy-free
    diversity) and copurchase_lift (co-occurrence lift)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    per = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("nu"))
    a = d.select(F.col("event_type").alias("type_a"), "user_id")
    b = d.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    pa = per.select(F.col("event_type").alias("type_a"),
                    F.col("nu").alias("na"))
    pb = per.select(F.col("event_type").alias("type_b"),
                    F.col("nu").alias("nb"))
    return (
        inter.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a", "type_b",
            F.col("na").cast("double").alias("n_a_d"),
            F.col("nb").cast("double").alias("n_b_d"),
            F.col("n_inter").cast("double").alias("n_inter_d"),
            F.expr(
                "CAST((n_inter * 1000000L) div (na + nb - n_inter)"
                " AS DOUBLE)"
            ).alias("jaccard_ppm_d"),
        )
    )


# --------------------------------------------------------------------------
# Streaming CUSUM ingest twin (daily event revenue)
# --------------------------------------------------------------------------

_STREAM_CUSUM_ORACLE = """
    WITH d AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS day,
             sum(CAST(floor(value * 100) AS BIGINT)) AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    t AS (SELECT sum(cents) // count(*) AS target FROM d),
    p AS MATERIALIZED (
      SELECT d.day, d.cents,
             sum(d2.cents) - count(*) * (SELECT target FROM t) AS pref
      FROM d JOIN d d2 ON d2.day <= d.day
      GROUP BY d.day, d.cents),
    s AS (
      SELECT p.day, p.cents,
             p.pref - least(0, min(p2.pref)) AS cusum
      FROM p JOIN p p2 ON p2.day <= p.day
      GROUP BY p.day, p.cents, p.pref)
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(cents AS DOUBLE) AS cents_d,
           CAST(cusum AS DOUBLE) AS cusum_cents_d
    FROM s
"""


@register("streaming_cusum_ingest", _STREAM_CUSUM_ORACLE)
def q_streaming_cusum_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM change detector maintained AT INGEST: the stateful
    stage is only the daily revenue rollup (ONE complete-mode streaming
    aggregation keyed by calendar day — state is calendar-bounded at
    any corpus size, the streaming_pivot_ingest shape), drained via
    availableNow and finished in batch with the closed-form Page
    prefix identity S_k = P_k - min(0, min_{j<=k} P_j) over the bounded
    daily frame (both prefix reductions are the broadcast self-join
    idiom — no iteration, no SinglePartition window). Integer cents
    throughout; the batch oracle applies verbatim because append-order
    cannot change a complete-mode sum. Streaming twin of
    cusum_daily_revenue (which monitors the orders ledger; this
    monitors the live event stream)."""
    from .q04_streamksql import _STREAM_SEQ, _replay_events

    stream = _replay_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
    )
    daily = stream.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.expr("sum(CAST(floor(value * 100) AS BIGINT))").alias("cents")
    )
    d = stream_sinks.run_to_memory(
        daily,
        f"reg_stream_cusum_{next(_STREAM_SEQ)}",
        output_mode="complete",
    ).localCheckpoint(eager=True)
    t = d.agg(F.expr("sum(cents) div count(*)").alias("target"))
    d2 = d.select(F.col("day").alias("day2"), F.col("cents").alias("cents2"))
    p = (
        d.join(F.broadcast(d2), F.col("day2") <= F.col("day"))
        .crossJoin(F.broadcast(t))
        .groupBy("day", "cents")
        .agg(
            (F.sum("cents2") - F.count(F.lit(1)) * F.first("target")).alias(
                "pref"
            )
        )
    )
    p2 = p.select(F.col("day").alias("day2"), F.col("pref").alias("pref2"))
    s = (
        p.join(F.broadcast(p2), F.col("day2") <= F.col("day"))
        .groupBy("day", "cents", "pref")
        .agg(
            (F.col("pref") - F.least(F.lit(0), F.min("pref2"))).alias(
                "cusum"
            )
        )
    )
    return s.select(
        "day",
        F.col("cents").cast("double").alias("cents_d"),
        F.col("cusum").cast("double").alias("cusum_cents_d"),
    )
