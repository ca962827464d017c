from __future__ import annotations

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import timeseries


def test_rollup_cascade_equals_direct(spark, sf_small):
    """The coarser grains are built from finer PARTIALS; they must equal a
    direct aggregation from the raw table (the decimal-sum path is what
    makes the cascade exact)."""
    ev = io_mod.load_table(spark, sf_small, "events")
    out = timeseries.multi_resolution_rollup(ev)
    day = out.filter(F.col("resolution") == "day")
    direct = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert day.count() == direct.count()
    assert (
        day.select("bucket_start", "event_type", "n_events", "sum_value",
                   "min_value", "max_value")
        .exceptAll(direct.select("bucket_start", "event_type", "n_events",
                                 "sum_value", "min_value", "max_value"))
        .count()
        == 0
    )


def test_rollup_conserves_events(spark, sf_small):
    ev = io_mod.load_table(spark, sf_small, "events")
    out = timeseries.multi_resolution_rollup(ev)
    total = ev.count()
    per_res = {
        r["resolution"]: r["n"]
        for r in out.groupBy("resolution").agg(F.sum("n_events").alias("n")).collect()
    }
    assert per_res == {"minute": total, "hour": total, "day": total}


def test_gap_fill_scaffold_is_dense_and_locf_non_null(spark, sf_small):
    ev = io_mod.load_table(spark, sf_small, "events")
    out = timeseries.gap_fill_locf(ev).cache()
    # dense: each user's bucket count == span hours + 1, no duplicates
    spans = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.count_distinct("bucket_start").alias("nd"),
        ((F.unix_timestamp(F.max("bucket_start"))
          - F.unix_timestamp(F.min("bucket_start"))) / 3600 + 1).alias("expect"),
    )
    assert spans.filter(
        (F.col("n") != F.col("nd")) | (F.col("n") != F.col("expect"))
    ).count() == 0
    # first bucket of every key has an observation, so LOCF is never NULL
    assert out.filter(F.col("locf_value").isNull()).count() == 0
    # zero-filled buckets carry the previous observation forward
    assert out.filter(F.col("n_events") == 0).count() > 0
    out.unpersist()


def test_gap_fill_conserves_event_count(spark, sf_small):
    ev = io_mod.load_table(spark, sf_small, "events")
    out = timeseries.gap_fill_locf(ev)
    assert (
        out.agg(F.sum("n_events")).collect()[0][0]
        == ev.filter(F.col("user_id").isNotNull()).count()
    )


def test_zscore_outliers_exactness_and_bounds(spark, sf_medium):
    """Flagged rows must genuinely exceed the threshold against
    independently computed float moments, and every unflagged row must
    sit below it (no misses): the decimal-moment path equals the plain
    float path on this data."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as sio
    from streaming_ml_with_ksql_spark.operators import timeseries

    ev = sio.load_table(spark, sf_medium, "events")
    out = timeseries.zscore_outliers(ev)
    flagged = {r.event_id: r.z_score for r in out.collect()}
    assert len(flagged) > 0

    stats = {
        r.event_type: (r.m, r.sd)
        for r in ev.groupBy("event_type")
        .agg(F.avg("value").alias("m"), F.stddev_pop("value").alias("sd"))
        .collect()
    }
    rows = ev.select("event_id", "event_type", "value").collect()
    for r in rows:
        m, sd = stats[r.event_type]
        z = (r.value - m) / sd
        if r.event_id in flagged:
            assert abs(z) >= 2.999, (r.event_id, z)
            assert abs(flagged[r.event_id] - z) < 1e-6
        else:
            assert abs(z) < 3.001, (r.event_id, z)


def test_zscore_constant_key_emits_no_outliers(spark):
    """A zero-variance key must produce NO outlier rows: sd = 0 would make
    z = 0/0 = NaN, which both Spark and DuckDB order above every double —
    without the sd > 0 guard the least anomalous data (a constant key)
    would flag every row (ADVICE r5)."""
    rows = [(i, "const", 5.0) for i in range(20)]
    # one genuinely-anomalous key alongside, so the query itself still fires
    rows += [(100 + i, "vary", 1.0) for i in range(50)]
    rows += [(200, "vary", 1000.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    out = timeseries.zscore_outliers(ev).collect()
    assert all(r.event_type != "const" for r in out)
    assert any(r.event_type == "vary" for r in out)  # guard didn't over-drop


def test_trend_fit_known_lines(spark):
    """Exact fixtures for the regression-quality query: a perfectly
    linear series fits with r2=1, rmse=0 and the planted slope; a
    symmetric V (zero correlation with time) fits slope 0 with r2=0;
    R2 never exceeds 1."""
    import datetime as dt

    from streaming_ml_with_ksql_spark import registry

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: v = 2 * day → slope_per_day = 2
    for d in range(5):
        rows.append((d, t0 + dt.timedelta(days=d), 1, "view", 2.0 * d, None))
    # user 2: symmetric V around the middle → slope 0, r2 0
    for d, v in enumerate([2.0, 1.0, 0.0, 1.0, 2.0]):
        rows.append((100 + d, t0 + dt.timedelta(days=d), 2, "view", v, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = spark.createDataFrame  # noqa: F841  (fixture frame built above)
    import tempfile, os
    tmp = tempfile.mkdtemp(prefix="trendfit_")
    ev.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = {
        r.user_id: r
        for r in registry.queries()["user_value_trend_fit"](spark, tmp).collect()
    }
    assert out[1].slope_per_day == 2.0 and out[1].r2 == 1.0 and out[1].rmse == 0.0
    assert out[2].slope_per_day == 0.0 and out[2].r2 == 0.0
    assert all(r.r2 <= 1.0 for r in out.values())
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
