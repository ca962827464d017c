"""Batch perceptron in EXACT INTEGER arithmetic — an in-engine linear
classifier whose entire training trajectory is engine- and
partitioning-exact, hence hash-checkable against an unrolled SQL
oracle.

Why this is exactly oracleable when SGD is not: the classic perceptron
update is per-sample (order-dependent), and float gradients diverge
across summation orders. The BATCH variant updates once per epoch with
the SUM of y*x over currently-misclassified points — an order-free
integer aggregate (Rosenblatt's rule applied batch-wise; public
textbook method, independently implemented). With coordinates
quantized once to exact micro-unit BIGINTs and the margin test
y*<w,x> <= 0 in integer arithmetic, every epoch is a deterministic
function of the previous weight vector, so T epochs replay identically
anywhere — the pagerank/kmeans fixed-point discipline applied to a
linear separator.

Scale shape: the weight vector lives as a 65-row (pos, wv) frame
(64 dims + the augmented bias coordinate), BROADCAST into the score
join; each epoch is one join + two map-side-combined groupBys over the
exploded (vec_id, pos, xv) frame — no driver-side collect, no
all-pairs. The exploded frame is localCheckpointed ONCE and reused by
every epoch; per-epoch lineage is truncated through the checkpointed
weight frame. At petabyte positive-counts the y*x sums need
DECIMAL(38) — documented, exact through ~1e5 rows x 4 epochs in BIGINT
here (|w| stays < ~1e10 micro-units, dots < ~1e18).

Reference parity: the reference trains outside the engine
(train.py:288-372); in-engine training is the north-star extension,
alongside kmeans_fixed_point and the integer-Gini stump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["batch_perceptron_trajectory", "fit_stump"]


def batch_perceptron_trajectory(
    emb: DataFrame,
    *,
    epochs: int = 4,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    positive_below: int = 5,
) -> DataFrame:
    """Train ``epochs`` batch-perceptron epochs on the binary coarse
    label (label < positive_below -> +1 else -1) and return the
    per-epoch trajectory: (epoch, n_mis, acc_ppm) for epoch 0..epochs,
    where epoch k's stats are measured UNDER w_k (w_0 = 0, so epoch 0
    reports every point misclassified — the y*s <= 0 convention counts
    zero scores as wrong) and w_{k+1} = w_k + sum(y*x over the
    misclassified set)."""
    spark = emb.sparkSession
    px = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.expr(
                f"CASE WHEN {label_col} < {positive_below}"
                " THEN 1L ELSE -1L END"
            ).alias("y"),
            F.expr(
                f"transform({vec_col}, x ->"
                f" CAST(floor(CAST(x AS DOUBLE) * {scale}.0) AS BIGINT))"
            ).alias("qv"),
        )
        .select(
            "vec_id",
            "y",
            F.posexplode(F.expr(f"concat(qv, array({scale}L))")).alias(
                "pos", "xv"
            ),
        )
        .localCheckpoint(eager=True)
    )
    dims = px.agg(F.max("pos")).collect()[0][0] + 1  # 64 + bias
    n_total = px.where(F.col("pos") == 0).count()

    w = spark.range(dims).select(
        F.col("id").cast("int").alias("pos"), F.lit(0).cast("long").alias("wv")
    ).localCheckpoint(eager=True)

    stats = []
    for k in range(epochs + 1):
        scores = (
            px.join(F.broadcast(w), "pos")
            .groupBy("vec_id", "y")
            .agg(F.sum(F.expr("xv * wv")).alias("s"))
        )
        mis = scores.where(F.expr("y * s <= 0")).select("vec_id", "y")
        n_mis = mis.count()
        stats.append((k, n_mis))
        if k == epochs:
            break
        upd = (
            px.join(mis.select("vec_id"), "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.expr("y * xv")).alias("dv"))
        )
        w = (
            w.join(upd, "pos", "left")
            .select(
                "pos",
                (F.col("wv") + F.coalesce("dv", F.lit(0).cast("long"))).alias(
                    "wv"
                ),
            )
            .localCheckpoint(eager=True)
        )
    out = spark.createDataFrame(stats, "epoch int, n_mis long")
    return out.select(
        F.col("epoch").cast("double").alias("epoch_d"),
        F.col("n_mis").cast("double").alias("n_mis_d"),
        F.expr(f"(({n_total}L - n_mis) * 1000000L) div {n_total}L")
        .cast("double")
        .alias("acc_ppm_d"),
    ).orderBy("epoch_d")


def fit_stump(
    fv: DataFrame, *, n_thresholds: int = 15, grid_div: int = 16
) -> DataFrame:
    """Fit an exact integer-Gini decision stump over a generic
    (fid, v, y) feature-value frame — the factored core of
    decision_stump_embedding, reusable by any feature extractor and by
    the streaming ingest twin (the (fid, v) histogram is an ADDITIVE
    sufficient statistic, so a drained stream of feature rows fits the
    identical stump). One-row output:
    (fid_d, thr_d, cost_ppm_d, n_left_d, train_acc_ppm_d).

    Same determinism/scale contract as the embedding stump: histogram
    first (map-side combined), deterministic integer threshold grid
    between each feature's exact min/max, cost in integer ppm with
    empty-side guards, argmin tie-broken on (fid, thr),
    TakeOrderedAndProject selection."""
    hist = fv.groupBy("fid", "v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    bounds = hist.groupBy("fid").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum("cnt").alias("n"),
        F.sum("pos").alias("p"),
    )
    spark = fv.sparkSession
    grid = bounds.crossJoin(
        spark.range(1, n_thresholds + 1).select(F.col("id").alias("j"))
    ).select(
        "fid",
        "n",
        "p",
        F.expr(f"lo + ((hi - lo) * j) div {grid_div}").alias("thr"),
    )
    # rename the join key on the histogram side: grid descends from hist,
    # and the self-referential join otherwise trips Spark's conflicting-
    # reference resolution on memory-sink-backed frames
    h2 = hist.select(
        F.col("fid").alias("hfid"), "v", "cnt", "pos"
    )
    split = (
        grid.join(h2, F.col("fid") == F.col("hfid"))
        .drop("hfid")
        .groupBy("fid", "thr", "n", "p")
        .agg(
            F.sum(F.expr("CASE WHEN v <= thr THEN cnt ELSE 0 END")).alias("n_l"),
            F.sum(F.expr("CASE WHEN v <= thr THEN pos ELSE 0 END")).alias("p_l"),
        )
    )
    scored = split.select(
        "fid",
        "thr",
        "n",
        "n_l",
        (
            F.expr(
                "CASE WHEN n_l = 0 THEN 0L"
                " ELSE p_l * (n_l - p_l) * 1000000L div n_l END"
            )
            + F.expr(
                "CASE WHEN n - n_l = 0 THEN 0L"
                " ELSE (p - p_l) * ((n - n_l) - (p - p_l)) * 1000000L"
                " div (n - n_l) END"
            )
        ).alias("cost_ppm"),
        F.expr(
            "greatest(p_l, n_l - p_l)"
            " + greatest(p - p_l, (n - n_l) - (p - p_l))"
        ).alias("correct"),
    )
    best = scored.orderBy("cost_ppm", "fid", "thr").limit(1)
    return best.select(
        F.col("fid").cast("double").alias("fid_d"),
        F.col("thr").cast("double").alias("thr_d"),
        F.col("cost_ppm").cast("double").alias("cost_ppm_d"),
        F.col("n_l").cast("double").alias("n_left_d"),
        F.expr("correct * 1000000L div n").cast("double").alias("train_acc_ppm_d"),
    )
