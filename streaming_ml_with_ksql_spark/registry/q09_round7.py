"""Round-7 additions: streaming maintenance twin for the perceptual
image-dedup family (VERDICT r6 #6) and subsequent round-7 operators.

Imported LAST from ``registry/__init__.py`` so the registration tail
order of all earlier queries is untouched.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401
from .q04_streamksql import _STREAM_SEQ  # noqa: F401
from .q06_sketchseries import _replay_documents  # noqa: F401


@register(
    "streaming_image_dedup",
    # The streamed document set is the FULL corpus (stateless append
    # emits every row; no watermark filtering), so the batch family
    # composite's verified oracle applies verbatim — the strongest
    # batch≡stream check available (same idiom as streaming_corpus_ingest).
    _REGISTRY["image_dedup_groups"].oracle,
)
def q_streaming_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the perceptual image-dedup family (the last
    north-star family without one — embeddings got ivf_ingest in r6):
    documents replayed as a file stream, PNG payloads synthesized and
    dHashed with the SAME narrow Arrow kernels as the batch path (both
    stages stateless → the append emission set equals the batch hash
    table exactly), then the continuously-maintained hash table is
    resolved into dedup groups by the banded-Hamming pair join + star
    components — the same split as the streaming quantile/rollup twins:
    ingest is continuous, resolution reads the drained state. Reference
    analog: the continuous topic-materialization pattern
    (README.md:41-52)."""
    docs = _t(spark, sf_dir, "documents")
    stream = _replay_documents(spark, sf_dir)
    hashes = multimodal.image_dhash(multimodal.synthesize_png_payload(stream))
    drained = stream_sinks.run_to_memory(
        hashes, f"reg_stream_imgdedup_{next(_STREAM_SEQ)}"
    )
    pairs = multimodal.image_near_dup_pairs_dhash(drained, max_hamming=3)
    return graph.dedup_groups(
        docs,
        pairs,
        id_col="doc_id",
        a_col="doc_a",
        b_col="doc_b",
        algorithm="star",
    )


from ..ml import metrics as ml_metrics  # noqa: E402


@register(
    "event_transition_matrix",
    """
    WITH p AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type AS next_type
      FROM events),
    c AS (SELECT prev_type, next_type, count(*) AS n
          FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.prev_type, c.next_type, CAST(c.n AS DOUBLE) AS n_d,
           CAST((c.n * 1000000) // t.tot AS DOUBLE) AS prob_ppm_d
    FROM c JOIN t USING (prev_type)
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event-type
    sequence — the next-event model behind journey analytics. One lag
    window PARTITIONED BY USER over the events (same shape as the
    sessionizers), then the corpus collapses to the |types|^2 pair
    frame; probabilities are exact integer parts-per-million
    (n * 1e6 div tot — no float division, hash-stable anywhere)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = p.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("double").alias("n_d"),
        F.expr("(n * 1000000L) div tot").cast("double").alias("prob_ppm_d"),
    )


@register(
    "roc_auc_purchase",
    """
    WITH cells AS (
      SELECT CAST(floor(value * 10) AS BIGINT) AS s,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS npos,
             sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS nneg
      FROM events GROUP BY 1),
    wb AS (
      SELECT c.s, c.npos, c.nneg,
             coalesce(sum(c2.npos + c2.nneg), 0) AS before
      FROM cells c LEFT JOIN cells c2 ON c2.s < c.s
      GROUP BY c.s, c.npos, c.nneg),
    agg AS (
      SELECT sum(npos * (2 * before + npos + nneg + 1)) AS ranksum2,
             sum(npos) AS np, sum(nneg) AS nn
      FROM wb)
    SELECT CAST(np AS DOUBLE) AS npos_d, CAST(nn AS DOUBLE) AS nneg_d,
           CAST(ranksum2 - np * (np + 1) AS DOUBLE) AS u2_d,
           CAST(ranksum2 - np * (np + 1) AS DOUBLE)
             / CAST(2 * np * nn AS DOUBLE) AS auc
    FROM agg
    """,
)
def q_roc_auc_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact ROC-AUC (does event value separate purchases
    from the rest?): Mann-Whitney rank-sum with average-rank ties over
    the deci-quantized score, integer rank algebra, no global sort
    (ml/metrics.py roc_auc_binary)."""
    ev = _t(spark, sf_dir, "events")
    return ml_metrics.roc_auc_binary(
        ev,
        (F.col("event_type") == "purchase").cast("int"),
        F.col("value"),
        quantize=10,
    )


@register(
    "score_calibration_bins",
    """
    WITH g AS (
      SELECT least(9, CAST(floor(value / 50.0) AS BIGINT)) AS bin,
             count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS npos
      FROM events GROUP BY 1)
    SELECT CAST(bin AS DOUBLE) AS bin_d, CAST(n AS DOUBLE) AS n_d,
           CAST(npos AS DOUBLE) AS npos_d,
           CAST((npos * 1000000) // n AS DOUBLE) AS pos_rate_ppm_d
    FROM g
    """,
)
def q_score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table for the value-as-score screen: ten
    fixed-width bins, observed purchase rate per bin in exact integer
    ppm (ml/metrics.py calibration_bins). One aggregation, no window."""
    ev = _t(spark, sf_dir, "events")
    return ml_metrics.calibration_bins(
        ev,
        (F.col("event_type") == "purchase").cast("int"),
        F.col("value"),
        bin_width=50.0,
        n_bins=10,
    )


@register(
    "mad_outliers_values",
    """
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type),
    f AS (
      SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
             abs(e.value - m.med) AS dev
      FROM events e
      JOIN med m ON e.event_type = m.event_type
      JOIN mad d ON e.event_type = d.event_type)
    SELECT event_id, event_type, value, med, mad,
           dev / (1.4826 * mad) AS robust_z
    FROM f
    WHERE mad > 0 AND dev > 3 * 1.4826 * mad
    """,
)
def q_mad_outliers_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen via median absolute deviation —
    the heavy-tail-safe twin of value_outliers_zscore (a polluted tail
    moves a stddev but not a median). Exact interpolated percentile per
    the order_value_percentiles contract; med/MAD rounded to 6 dp BEFORE
    the boundary comparison so the flagged set is engine-stable
    (operators/timeseries.py mad_outliers)."""
    ev = _t(spark, sf_dir, "events")
    return timeseries.mad_outliers(ev, threshold=3.0)


@register(
    "cusum_changepoints",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
      FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, count(*) AS d, sum(cnt) AS t
           FROM daily GROUP BY 1),
    c AS (
      SELECT daily.event_type, day, d, t,
             sum(cnt * d - t) OVER (PARTITION BY daily.event_type
                                    ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cusum
      FROM daily JOIN st USING (event_type))
    SELECT event_type, day AS change_day, CAST(cusum AS DOUBLE) AS cusum_d,
           CAST(d AS DOUBLE) AS n_days_d, CAST(t AS DOUBLE) AS total_d
    FROM c
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(cusum) DESC, day ASC) = 1
    """,
)
def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift locator per event type: the observed day with the
    largest |CUSUM| of the daily count series, integer-exact (deviations
    scaled by the day count so the running sum is a BIGINT ending at 0).
    All windows run on the calendar-bounded daily frame partitioned by
    key (operators/timeseries.py cusum_changepoints)."""
    ev = _t(spark, sf_dir, "events")
    return timeseries.cusum_changepoints(ev)


@register(
    "revenue_autocorr",
    """
    WITH daily AS (
      SELECT datediff('day', TIMESTAMP '1995-01-01',
                      date_trunc('day', o_orderdate)) AS t,
             (sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000) AS x
      FROM orders GROUP BY 1),
    l AS (SELECT unnest(range(1, 8)) AS lag),
    p AS (SELECT lag, a.x AS xa, b.x AS xb
          FROM daily a CROSS JOIN l JOIN daily b ON b.t = a.t + lag),
    g AS (SELECT lag, count(*) AS n, sum(xa) AS sa, sum(xb) AS sb,
                 sum(xa * xb) AS sab, sum(xa * xa) AS saa,
                 sum(xb * xb) AS sbb
          FROM p GROUP BY 1)
    SELECT CAST(lag AS DOUBLE) AS lag_d, CAST(n AS DOUBLE) AS n_d,
           CASE WHEN (n * saa - sa * sa) > 0 AND (n * sbb - sb * sb) > 0
                THEN CAST(n * sab - sa * sb AS DOUBLE)
                     / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                        * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
                ELSE 0.0 END AS acf
    FROM g
    """,
)
def q_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily order revenue at lags 1..7 — the
    seasonality probe behind the seasonal-naive forecaster. Revenue
    pre-scaled to exact kilodollar integers (floor per order, integer
    div per day: deterministic on any engine, and n*sum(x^2) stays well
    under 2^63 / 2^53 at bench scales); the six per-lag sums are exact
    BIGINTs and the only float arithmetic is the single final Pearson
    expression (operators/timeseries.py autocorrelation)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("o_orderdate")),
            F.lit("1995-01-01").cast("timestamp"),
        ).alias("t")
    ).agg(
        F.expr(
            "sum(CAST(floor(o_totalprice) AS BIGINT)) div 1000L"
        ).alias("x")
    )
    return timeseries.autocorrelation(daily, t_col="t", x_col="x", max_lag=7)


@register(
    "user_life_table",
    """
    WITH span AS (
      SELECT user_id,
             datediff('day', date_trunc('day', min(ts)),
                      date_trunc('day', max(ts))) AS tenure,
             max(date_trunc('day', ts)) AS last_day
      FROM events GROUP BY user_id),
    horizon AS (SELECT max(date_trunc('day', ts)) AS maxd FROM events),
    lab AS (
      SELECT tenure,
             CASE WHEN datediff('day', last_day, maxd) < 7 THEN 1 ELSE 0 END
               AS censored
      FROM span CROSS JOIN horizon),
    g AS (SELECT tenure, count(*) AS n_total,
                 sum(1 - censored) AS d_churn, sum(censored) AS c_cens
          FROM lab GROUP BY 1),
    r AS (
      SELECT g.tenure, g.d_churn, g.c_cens, sum(g2.n_total) AS n_risk
      FROM g JOIN g g2 ON g2.tenure >= g.tenure
      GROUP BY g.tenure, g.d_churn, g.c_cens)
    SELECT CAST(tenure AS DOUBLE) AS tenure_d,
           CAST(n_risk AS DOUBLE) AS n_risk_d,
           CAST(d_churn AS DOUBLE) AS d_churn_d,
           CAST(c_cens AS DOUBLE) AS c_cens_d,
           CAST((d_churn * 1000000) // n_risk AS DOUBLE) AS hazard_ppm_d
    FROM r
    """,
)
def q_user_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier life table of user tenure (days between first and
    last observed event), right-censored for users still active within
    7 days of the corpus horizon: per tenure day, the number at risk,
    churn events, censored exits, and the discrete hazard in exact
    integer ppm. The corpus collapses to one row per user, then to one
    row per tenure day (bounded by the calendar span); the at-risk
    suffix sum is the O(C^2) broadcast self-join over that bounded
    frame — no partition-less window, all-integer output."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    span = ev.groupBy("user_id").agg(
        F.datediff(F.max(day), F.min(day)).alias("tenure"),
        F.max(day).alias("last_day"),
    )
    horizon = ev.agg(F.max(day).alias("maxd"))
    lab = span.crossJoin(F.broadcast(horizon)).select(
        "tenure",
        F.when(
            F.datediff(F.col("maxd"), F.col("last_day")) < 7, F.lit(1)
        ).otherwise(F.lit(0)).alias("censored"),
    )
    g = lab.groupBy("tenure").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.lit(1) - F.col("censored")).alias("d_churn"),
        F.sum("censored").alias("c_cens"),
    )
    g2 = g.select(F.col("tenure").alias("__t2"), F.col("n_total").alias("__n2"))
    r = (
        g.join(F.broadcast(g2), F.col("__t2") >= F.col("tenure"))
        .groupBy("tenure", "d_churn", "c_cens")
        .agg(F.sum("__n2").alias("n_risk"))
    )
    return r.select(
        F.col("tenure").cast("double").alias("tenure_d"),
        F.col("n_risk").cast("double").alias("n_risk_d"),
        F.col("d_churn").cast("double").alias("d_churn_d"),
        F.col("c_cens").cast("double").alias("c_cens_d"),
        F.expr("(d_churn * 1000000L) div n_risk")
        .cast("double")
        .alias("hazard_ppm_d"),
    )
