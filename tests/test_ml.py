"""ML surface tests: registry-resolved scoring, API parity with the
reference's predict UDF, frozen-prediction reproducibility (FIXTURES.md C4)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.functions.scalars import as_array
from streaming_ml_with_ksql_spark.ml import predict as ml_predict
from streaming_ml_with_ksql_spark.ml.features import (
    INT_FEATURES,
    build_training_frame,
)
from tests.oracle import assert_query_matches

MODEL = "bot_detector"


@pytest.fixture(scope="module")
def frame(spark, sf_medium):
    return build_training_frame(
        io_mod.load_table(spark, sf_medium, "events"),
        io_mod.load_table(spark, sf_medium, "customer"),
    ).cache()


def test_tree_is_threshold_rule(spark):
    """Guards the SQL oracle for score_events: the frozen model must stay a
    single events_in_window<=4.5 split. If retraining changes this, the
    registry oracle must be re-derived."""
    model, _ = ml_predict.resolve_model(MODEL)
    tree = model.stages[-2]
    dbg = tree.toDebugString
    assert "feature 8 <= 4.5" in dbg and tree.depth == 1, dbg


def test_score_matches_frozen_predictions(spark, frame):
    frozen = spark.read.parquet(
        f"{ml_predict.DEFAULT_MODELS_DIR}/{MODEL}/Production/frozen_predictions"
    )
    sample = frame.orderBy("event_id").limit(200)
    live = ml_predict.score(sample, MODEL).select("event_id", "prediction")
    diff = live.join(
        frozen.withColumnRenamed("prediction", "frozen"), "event_id"
    ).filter(F.col("prediction") != F.col("frozen"))
    assert diff.count() == 0


def test_score_events_matches_oracle(spark, sf_medium):
    assert_query_matches(spark, "score_events", sf_medium)


def test_predict_arrays_matches_oracle(spark, sf_medium):
    assert_query_matches(spark, "predict_arrays_events", sf_medium)


def test_predict_arrays_error_to_null(spark, frame):
    """Malformed inputs → NULL prediction, query survives
    (reference: PredictUdf.java:60-63)."""
    bad = frame.limit(10).select(
        "event_id",
        as_array("c_mktsegment").alias("s"),
        F.lit(None).cast("array<int>").alias("i"),
    )
    out = ml_predict.predict_arrays(bad, MODEL, "s", "i")
    assert out.filter(F.col("prediction").isNotNull()).count() == 0

    short = frame.limit(10).select(
        "event_id",
        as_array("c_mktsegment").alias("s"),
        F.array(F.lit(1)).alias("i"),  # too short vs 4 int features
    )
    out2 = ml_predict.predict_arrays(short, MODEL, "s", "i")
    assert out2.filter(F.col("prediction").isNotNull()).count() == 0


def test_predict_arrays_positional_binding(spark, frame):
    """Ints bind by position, not name (PredictUdf.java:48-56): swapping two
    positions must change which feature the threshold sees."""
    sample = frame.filter(F.col("events_in_window") >= 5).limit(5)
    if sample.count() == 0:
        pytest.skip("no bot-dense rows at this sf")
    ordered = sample.select(
        "event_id",
        as_array("c_mktsegment").alias("s"),
        as_array(*INT_FEATURES).alias("i"),
    )
    preds = ml_predict.predict_arrays(ordered, MODEL, "s", "i")
    assert preds.filter(F.col("prediction") == "bot").count() == sample.count()

    # events_in_window (last position) replaced by 0 → all 'user'
    zeroed = sample.select(
        "event_id",
        as_array("c_mktsegment").alias("s"),
        F.array(
            *[F.col(c) for c in INT_FEATURES[:-1]], F.lit(0)
        ).alias("i"),
    )
    preds0 = ml_predict.predict_arrays(zeroed, MODEL, "s", "i")
    assert preds0.filter(F.col("prediction") == "user").count() == sample.count()
