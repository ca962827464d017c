"""CDC envelope unwrap / snapshot semantics (SURVEY.md S3) and the Avro
capability seam."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark.sources import avro, cdc


def _envelope(spark):
    """A tiny hand-built Debezium changelog for table {id, name, balance}:
    snapshot reads, an update, an insert, a delete, and a
    delete-then-reinsert."""

    def rec(id_, name, balance):
        return Row(id=id_, name=name, balance=balance)

    rows = [
        # initial snapshot (op=r) at t=1000
        Row(before=None, after=rec(1, "alice", 10.0), op="r", ts_ms=1000),
        Row(before=None, after=rec(2, "bob", 20.0), op="r", ts_ms=1000),
        Row(before=None, after=rec(3, "carol", 30.0), op="r", ts_ms=1000),
        # update bob at t=2000
        Row(before=rec(2, "bob", 20.0), after=rec(2, "bob", 25.0), op="u", ts_ms=2000),
        # insert dave at t=2500
        Row(before=None, after=rec(4, "dave", 40.0), op="c", ts_ms=2500),
        # delete carol at t=3000
        Row(before=rec(3, "carol", 30.0), after=None, op="d", ts_ms=3000),
        # delete then re-insert alice
        Row(before=rec(1, "alice", 10.0), after=None, op="d", ts_ms=3500),
        Row(before=None, after=rec(1, "alice2", 11.0), op="c", ts_ms=4000),
    ]
    return spark.createDataFrame(rows)


def test_unwrap_drops_deletes_by_default(spark):
    flat = cdc.unwrap_debezium(_envelope(spark))
    assert flat.filter(F.col("__op") == "d").count() == 0
    assert flat.count() == 6  # 3 snapshot + 1 update + 2 inserts
    assert set(flat.columns) == {"id", "name", "balance", "__op", "__ts_ms"}


def test_unwrap_keeps_deletes_from_before_image(spark):
    flat = cdc.unwrap_debezium(_envelope(spark), keep_deletes=True)
    dels = flat.filter(F.col("__op") == "d").collect()
    assert {(r.id, r.name) for r in dels} == {(3, "carol"), (1, "alice")}


def test_cdc_snapshot_upsert_semantics(spark):
    snap = cdc.cdc_snapshot(_envelope(spark), "id")
    got = {(r.id, r.name, r.balance) for r in snap.collect()}
    assert got == {
        (1, "alice2", 11.0),  # delete then re-insert → latest wins
        (2, "bob", 25.0),  # update applied
        (4, "dave", 40.0),  # insert
        # carol deleted
    }
    assert "__op" not in snap.columns


def test_avro_capability_probe(spark):
    """In this environment the spark-avro SQL jar is absent; the probe must
    say so (a bare Python import would lie — the wrapper module always
    imports)."""
    available = avro.avro_available(spark)
    if not available:
        df = spark.createDataFrame([Row(b=bytearray(b"x"))])
        try:
            df.select(avro.decode_avro(F.col("b"), '"bytes"')).collect()
            raised = False
        except Exception:
            raised = True
        assert raised


def test_format_roundtrips_lossless(spark, sf_medium):
    """JSONL and CSV round-trips must be lossless against the parquet
    source of truth (driver oracle states the same at the value level)."""
    from tests.oracle import assert_query_matches

    assert_query_matches(spark, "json_source_roundtrip", sf_medium)
    assert_query_matches(spark, "csv_source_roundtrip", sf_medium)
