"""The reference's COMPLETE demo, end to end, with zero external
infrastructure: our own deterministic traffic generator stands in for the
doge_datagen→Kafka pipeline, the KSQL compat layer runs the runbook's
literal statements, and the trained pipeline model scores the enriched
windows — generator → stream DDL → rekey → table compaction → hopping
window → user join → predict(), exactly the path the reference wires
through Kafka + ksqlDB + MLflow (reference: README.md:27-70,
traffic-generator/generator.py, docker-compose.yaml)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark.ksql import KsqlCompat
from streaming_ml_with_ksql_spark.sources import generator
from tests.test_ksql_compat import (
    STMT_AGG_STREAM,
    STMT_EVENTS,
    STMT_HOPPING,
    STMT_PREDICT,
    STMT_REKEY,
    STMT_USERS_STREAM,
    STMT_USERS_TABLE,
)


def test_reference_demo_end_to_end_on_generated_traffic(spark):
    users = generator.synthetic_users_profile(spark, n_users=40).withColumn(
        "updated_at", F.timestamp_millis(F.lit(generator.TS_START_MS))
    )
    clicks = generator.synthetic_clickstream(
        spark, n_users=40, n_bots=10, n_ticks=120
    )
    events = clicks.select(
        "user_id", F.timestamp_millis("ts_ms").alias("ts"), "event"
    )
    # WIRE-ACCURATE topics (round 6): both topics pass through the
    # Confluent framing (0x00 magic + schema id + Avro binary, local
    # schema registry) before binding — exactly the bytes the reference's
    # producers put on Kafka; only the broker process is absent.
    from streaming_ml_with_ksql_spark.sources import avro_py

    reg = avro_py.LocalSchemaRegistry()
    users = avro_py.decode_confluent(
        avro_py.encode_confluent(users, reg, "mysql.demo.users"), reg
    )
    events = avro_py.decode_confluent(
        avro_py.encode_confluent(events, reg, "events"), reg
    )
    ksql = KsqlCompat(
        spark,
        {"mysql.demo.users": (users, "updated_at"), "events": (events, "ts")},
    )
    for stmt in (
        STMT_USERS_STREAM,
        STMT_REKEY,
        STMT_USERS_TABLE,
        STMT_EVENTS,
        STMT_HOPPING,
        STMT_AGG_STREAM,
    ):
        ksql.execute(stmt)

    # the hopping table covers the 2-minute simulation at 2-min hops
    agg = spark.table("events_in_10_minutes_window")
    assert agg.count() > 0
    assert {r.user_id for r in agg.select("user_id").distinct().collect()} == set(
        range(40)
    )

    scored = ksql.execute(STMT_PREDICT)
    rows = scored.collect()
    assert len(rows) == agg.count()
    assert set(scored.columns) == {
        "user_id", "ip_address", "window_start", "window_end", "prediction",
    }
    preds = {r.prediction for r in rows}
    assert preds <= {"bot", "user", None} and preds & {"bot", "user"}
    # enrichment really flowed: generated users carry generated IPs
    ips = {r.ip_address for r in rows if r.ip_address is not None}
    assert ips and all(ip.count(".") == 3 for ip in ips)
