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
