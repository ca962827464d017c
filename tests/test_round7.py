"""Round-7 operator tests: ML-eval metrics (AUC, calibration), Markov
transitions, robust MAD outliers — semantic properties beyond the oracle
hash (which scripts/verify_driver.py covers)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.ml import metrics as ml_metrics
from streaming_ml_with_ksql_spark.operators import timeseries


def test_roc_auc_matches_pandas_rank_formula(spark, sf_small):
    """The distributed rank algebra must equal the direct average-rank
    Mann-Whitney computation on the same quantized score."""
    ev = io_mod.load_table(spark, sf_small, "events")
    out = ml_metrics.roc_auc_binary(
        ev,
        (F.col("event_type") == "purchase").cast("int"),
        F.col("value"),
        quantize=10,
    ).collect()[0]

    pdf = ev.select("event_type", "value").toPandas()
    pdf["s"] = (pdf["value"] * 10).apply(lambda v: int(v // 1))
    pdf["y"] = (pdf["event_type"] == "purchase").astype(int)
    pdf["rank"] = pdf["s"].rank(method="average")
    npos = int(pdf["y"].sum())
    nneg = len(pdf) - npos
    u = pdf.loc[pdf["y"] == 1, "rank"].sum() - npos * (npos + 1) / 2
    expected = u / (npos * nneg)
    assert abs(out["auc"] - expected) < 1e-12
    assert out["npos_d"] == npos and out["nneg_d"] == nneg


def test_roc_auc_degenerate_orderings(spark):
    """Score==label gives AUC 1; anti-correlated gives 0; constant score
    gives exactly 0.5 through the tie handling."""
    rows = [(float(i), i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, y int")
    perfect = ml_metrics.roc_auc_binary(
        df, F.col("y"), F.col("y").cast("double"), quantize=10
    ).collect()[0]["auc"]
    assert perfect == 1.0
    anti = ml_metrics.roc_auc_binary(
        df, F.col("y"), (1 - F.col("y")).cast("double"), quantize=10
    ).collect()[0]["auc"]
    assert anti == 0.0
    const = ml_metrics.roc_auc_binary(
        df, F.col("y"), F.lit(1.0), quantize=10
    ).collect()[0]["auc"]
    assert const == 0.5


def test_calibration_bins_partition_the_corpus(spark, sf_small):
    ev = io_mod.load_table(spark, sf_small, "events")
    out = ml_metrics.calibration_bins(
        ev,
        (F.col("event_type") == "purchase").cast("int"),
        F.col("value"),
        bin_width=50.0,
        n_bins=10,
    ).toPandas()
    assert out["n_d"].sum() == ev.count()
    assert (out["pos_rate_ppm_d"] >= 0).all()
    assert (out["pos_rate_ppm_d"] <= 1_000_000).all()
    # exact integer ppm: floor(npos*1e6/n)
    recomputed = (out["npos_d"] * 1_000_000 // out["n_d"]).astype(float)
    assert (out["pos_rate_ppm_d"] == recomputed).all()


def test_transition_matrix_row_stochastic(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = _REGISTRY["event_transition_matrix"].spark(spark, sf_small).toPandas()
    ev = io_mod.load_table(spark, sf_small, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user's first event has no predecessor
    assert out["n_d"].sum() == n_events - n_users
    by_prev = out.groupby("prev_type")["prob_ppm_d"].sum()
    n_next = out.groupby("prev_type")["next_type"].count()
    # integer-truncated ppm: each row loses < 1 ppm
    assert ((by_prev <= 1_000_000) & (by_prev > 1_000_000 - n_next)).all()


def test_mad_flags_injected_spike_zscore_misses_nothing_worse(spark):
    """A heavy-tailed key: MAD flags the genuine spike even though the
    tail inflates the stddev; and every flagged row truly violates the
    rounded-boundary rule."""
    rows = [(i, "k", float(v)) for i, v in enumerate([10, 11, 12, 10, 11, 12, 10, 11, 12, 500])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = timeseries.mad_outliers(df).toPandas()
    assert set(out["event_id"]) == {9}
    assert (out["robust_z"] > 3).all()


def test_mad_constant_key_flags_nothing(spark):
    rows = [(i, "k", 7.0) for i in range(20)] + [(99, "k", 7.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    assert timeseries.mad_outliers(df).count() == 0


def test_mad_boundary_discipline(spark, sf_small):
    """Every flagged row satisfies dev > 3*1.4826*mad with the ROUNDED
    med/mad actually emitted (the cross-engine boundary contract)."""
    ev = io_mod.load_table(spark, sf_small, "events")
    out = timeseries.mad_outliers(ev).toPandas()
    dev = (out["value"] - out["med"]).abs()
    assert (dev > 3 * 1.4826 * out["mad"]).all()
    assert (out["mad"] > 0).all()
