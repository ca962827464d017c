"""Structured Streaming parity: the same queries, replayed as a
multi-batch file stream, must converge to the batch answer (SURVEY.md
§5.2 streaming-parity check; §2.5 W1-W5).

The events table is re-sharded into 4 time-range parquet files replayed
in order (maxFilesPerTrigger=1) — a deterministic stand-in for the
reference's Kafka topic with bounded disorder.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import dedup, windows
from streaming_ml_with_ksql_spark.streaming import (
    foreach_batch_parquet,
    hopping_window_stream,
    latest_per_key_stream,
    run_to_memory,
    sessionize_stream,
    shard_table_to_dir,
    stream_parquet_dir,
)
from streaming_ml_with_ksql_spark.streaming.sinks import run_foreach_batch
from streaming_ml_with_ksql_spark.streaming.stateful import latest_per_key_stateful

WM_DELAY = "2 minutes"


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_small, tmp_path_factory) -> str:
    events = io_mod.load_table(spark, sf_small, "events")
    path = str(tmp_path_factory.mktemp("events_stream"))
    return shard_table_to_dir(events, path, num_shards=4, order_col="ts")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hopping_stream_matches_batch(spark, events_stream_dir):
    """Append-mode hopping agg over the replay == batch agg restricted to
    watermark-finalized windows (the documented W3/W5 divergence: Spark
    append emits once, finalized; trailing windows stay open)."""
    stream = stream_parquet_dir(spark, events_stream_dir)
    out = run_to_memory(
        hopping_window_stream(stream, watermark_delay=WM_DELAY),
        "hopping_stream_test",
    )

    batch_events = spark.read.parquet(events_stream_dir)
    batch = windows.hopping_window_agg(batch_events)
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    # final watermark = max event time - delay; append emits windows with
    # end <= watermark
    expected = batch.filter(
        F.col("window_end") <= F.lit(max_ts) - F.expr(f"INTERVAL {WM_DELAY}")
    )

    cols = sorted(out.columns)
    assert sorted(out.columns) == sorted(batch.columns)
    assert _rows(out, cols) == _rows(expected, cols)
    assert out.count() > 0


def test_late_data_dropped_per_watermark_policy(spark, sf_small):
    """W5 planted-late-data check: the replay delivers a day-late sliver
    after the watermark has fully advanced (heartbeat batches account for
    the SPARK-24634 one-batch admission-filter lag); the DuckDB oracle
    states the watermark-dropped emission set explicitly, so oracle
    equality proves the late events are absent from every aggregate."""
    from tests.oracle import assert_query_matches

    assert_query_matches(spark, "streaming_late_data_policy", sf_small)


def test_latest_per_key_stream_matches_batch(spark, events_stream_dir):
    """Complete-mode max_by table == batch latest_per_key (KSQL TABLE
    semantics, reference README.md:29), with identical tiebreak."""
    stream = stream_parquet_dir(spark, events_stream_dir)
    out = run_to_memory(
        latest_per_key_stream(stream, "user_id", "ts", tiebreak="event_id"),
        "latest_stream_test",
        output_mode="complete",
    )
    batch = dedup.latest_per_key(
        spark.read.parquet(events_stream_dir), "user_id", "ts", tiebreak="event_id"
    )
    cols = sorted(batch.columns)
    assert _rows(out, cols) == _rows(batch, cols)


def test_sessionize_stateful_matches_session_window(spark, events_stream_dir):
    """applyInPandasWithState sessionization == batch session_window for
    every session closed by the final watermark."""
    gap = "1 minute"
    stream = stream_parquet_dir(spark, events_stream_dir)
    out = run_to_memory(
        sessionize_stream(
            stream, key_col="user_id", ts_col="ts", gap=gap, watermark_delay=WM_DELAY
        ),
        "sessionize_test",
    )

    batch_events = spark.read.parquet(events_stream_dir)
    batch = windows.session_window_agg(
        batch_events, key_col="user_id", gap=gap
    ).withColumnRenamed("first_ts", "session_start").withColumnRenamed(
        "last_ts", "session_end"
    )
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    closed = batch.filter(
        F.col("session_end") + F.expr(f"INTERVAL {gap}")
        <= F.lit(max_ts) - F.expr(f"INTERVAL {WM_DELAY}")
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    out_rows = _rows(out.select(*cols), cols)
    closed_rows = _rows(closed.select(*cols), cols)
    assert len(out_rows) > 0
    # every watermark-closed batch session must be emitted by the stream
    assert set(closed_rows) <= set(out_rows)
    # and stream emissions must be genuine batch sessions
    all_rows = set(_rows(batch.select(*cols), cols))
    assert set(out_rows) <= all_rows


def test_latest_per_key_stateful_delta_stream(spark, events_stream_dir):
    """The stateful changelog variant: last emitted delta per key == batch
    latest row per key."""
    stream = stream_parquet_dir(spark, events_stream_dir)
    out = run_to_memory(
        latest_per_key_stateful(
            stream,
            key_col="user_id",
            ts_col="ts",
            payload_cols=("event_type", "value"),
            watermark_delay=WM_DELAY,
        ),
        "latest_stateful_test",
    )
    # deltas are monotone in ts per key → the max-ts delta is the final state
    final = dedup.latest_per_key(out, "user_id", "ts")
    batch = dedup.latest_per_key(
        spark.read.parquet(events_stream_dir), "user_id", "ts"
    ).select("user_id", "ts", "event_type", "value")
    cols = ["user_id", "ts", "event_type", "value"]
    assert _rows(final.select(*cols), cols) == _rows(batch, cols)


def test_enriched_scored_stream(spark, sf_small, events_stream_dir, tmp_path):
    """End-to-end serving pipeline (reference README.md:62-70): windowed agg
    stream → stream-static broadcast join with latest customers → model
    scoring → foreachBatch sink."""
    from streaming_ml_with_ksql_spark.streaming.queries import enrich_and_score_stream

    customers = io_mod.load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_name", "c_nationkey"
    )
    stream = stream_parquet_dir(spark, events_stream_dir)
    agg = hopping_window_stream(stream, watermark_delay=WM_DELAY)
    enriched = enrich_and_score_stream(agg, customers, dim_key="cust_id")

    sink_dir = str(tmp_path / "bot_detection_results")
    run_foreach_batch(enriched, foreach_batch_parquet(sink_dir))

    written = spark.read.parquet(sink_dir)
    assert written.count() > 0
    assert "c_name" in written.columns and "__batch_id" in written.columns
    # left-join semantics: every agg row survives, matched rows carry names
    assert written.filter(F.col("c_name").isNotNull()).count() > 0


def test_streaming_model_scoring(spark, sf_small, events_stream_dir):
    """U2 in streaming: the fitted PipelineModel transform composes with a
    streaming frame (pure column expressions), scoring each micro-batch —
    the continuous form of the reference's predict() projection."""
    from streaming_ml_with_ksql_spark.ml import predict as ml_predict

    def feats(df):
        # plain projections (analytic window functions are unsupported on
        # streams; feature values just need to be deterministic here)
        return df.select(
            "event_id",
            F.lit("BUILDING").alias("c_mktsegment"),
            (F.col("value") * 10).cast("int").alias("views_in_window"),
            (F.col("value") * 5).cast("int").alias("clicks_in_window"),
            (F.col("event_id") % 3).cast("int").alias("purchases_in_window"),
            (F.col("event_id") % 7).cast("int").alias("events_in_window"),
        )

    stream = stream_parquet_dir(spark, events_stream_dir)
    scored = ml_predict.score(feats(stream), "bot_detector")
    out = run_to_memory(scored, "stream_scored_test")

    expected = ml_predict.score(
        feats(spark.read.parquet(events_stream_dir)), "bot_detector"
    )

    cols = ["event_id", "prediction"]
    assert _rows(out.select(*cols), cols) == _rows(expected.select(*cols), cols)
    vals = {r.prediction for r in out.select("prediction").distinct().collect()}
    assert vals <= {"bot", "user"}


def test_checkpoint_recovery_exactly_once(spark, sf_small, tmp_path):
    """Stop/resume with a checkpoint: a query drained over the first half
    of the data, then restarted (new process-equivalent: new query object,
    same checkpoint) over the full directory, must produce exactly the
    batch answer with no duplicates — Spark's exactly-once contract over
    the file source + foreachBatch sink."""
    import os
    import shutil

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import dedup

    events = io_mod.load_table(spark, sf_small, "events")
    full_dir = str(tmp_path / "full")
    shard_table_to_dir(events, full_dir, num_shards=4, order_col="ts")
    parts = sorted(
        f for f in os.listdir(full_dir) if f.startswith("part-")
    )

    live_dir = str(tmp_path / "live")
    os.makedirs(live_dir)
    for f in parts[:2]:
        shutil.copy2(os.path.join(full_dir, f), os.path.join(live_dir, f))

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = stream_parquet_dir(spark, live_dir)
        q = (
            latest_per_key_stream(stream, "user_id", "ts", tiebreak="event_id")
            .writeStream.foreachBatch(foreach_batch_parquet(sink))
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    for f in parts[2:]:
        shutil.copy2(os.path.join(full_dir, f), os.path.join(live_dir, f))
    run_once()

    # complete-mode foreachBatch appends a full snapshot per batch; the
    # LAST batch's snapshot must equal the batch answer over all data
    written = spark.read.parquet(sink)
    last_bid = written.agg(F.max("__batch_id")).collect()[0][0]
    final = written.filter(F.col("__batch_id") == last_bid).drop("__batch_id")
    expected = dedup.latest_per_key(
        spark.read.parquet(full_dir), "user_id", "ts", tiebreak="event_id"
    )
    cols = sorted(expected.columns)
    assert _rows(final, cols) == _rows(expected, cols)


def test_streaming_hll_registers_equal_batch(spark, sf_small):
    """Max registers are order-insensitive, so the drained streaming HLL
    must equal the batch sketch register-for-register (and its DuckDB
    oracle, which assert_query_matches checks)."""
    from tests.oracle import assert_query_matches

    assert_query_matches(spark, "streaming_hll_registers", sf_small)


def test_mongo_standin_collection_is_idempotent(
    spark, sf_small, events_stream_dir, tmp_path, monkeypatch
):
    """S5 parity drill (VERDICT r4 #8): the bot_detection_results shape
    round-trips through the JSONL 'collection' (the Mongo stand-in) and
    re-running the drained query — foreachBatch's redelivery case — is
    exactly-once: batch-id-keyed writes leave the collection
    byte-identical. Recovery: a deleted batch file is restored
    identically on replay. Rows never pass through the driver (VERDICT
    r5 #2): every run executes with DataFrame.collect poisoned — the
    writer serializes partitions executor-side."""
    import json
    import os

    from pyspark.sql import DataFrame as SparkDataFrame

    from streaming_ml_with_ksql_spark.streaming.queries import (
        enrich_and_score_stream,
        hopping_window_stream,
    )
    from streaming_ml_with_ksql_spark.streaming.sinks import (
        foreach_batch_jsonl_collection,
    )

    def _no_collect(self):
        raise AssertionError("Mongo stand-in sink collected rows to the driver")

    monkeypatch.setattr(SparkDataFrame, "collect", _no_collect)

    customers = io_mod.load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_name", "c_nationkey"
    )

    def _results_stream():
        stream = stream_parquet_dir(spark, events_stream_dir)
        agg = hopping_window_stream(stream, watermark_delay=WM_DELAY)
        return enrich_and_score_stream(agg, customers, dim_key="cust_id")

    coll = str(tmp_path / "bot_detection_results_jsonl")
    run_foreach_batch(_results_stream(), foreach_batch_jsonl_collection(coll))

    def _snapshot() -> dict[str, str]:
        return {
            f: open(os.path.join(coll, f)).read()
            for f in sorted(os.listdir(coll))
        }

    first = _snapshot()
    assert first and all(f.endswith(".jsonl") for f in first)
    docs = [
        json.loads(line)
        for content in first.values()
        for line in content.splitlines()
    ]
    assert len(docs) > 0 and all("user_id" in d for d in docs)
    assert any("c_name" in d for d in docs)  # enrichment rode along

    # re-run the SAME query (no checkpoint → same deterministic batch
    # split, batch ids restart at 0 = redelivery): collection unchanged
    run_foreach_batch(_results_stream(), foreach_batch_jsonl_collection(coll))
    assert _snapshot() == first

    # crash-recovery: drop one batch file; replay restores it identically
    victim = sorted(first)[0]
    os.remove(os.path.join(coll, victim))
    run_foreach_batch(_results_stream(), foreach_batch_jsonl_collection(coll))
    assert _snapshot() == first


def test_threshold_alert_stream_semantics(spark, tmp_path):
    """Alert-once threshold state machine: first trailing-window crossing
    emits exactly one row per key, peers at the crossing timestamp all
    count (RANGE semantics), later bursts do NOT re-alert, and
    under-threshold keys stay silent."""
    import datetime as dt

    from streaming_ml_with_ksql_spark.streaming.stateful import (
        threshold_alert_stream,
    )

    t0 = dt.datetime(2024, 1, 1)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = []
    # user 1: burst crossing N=3 inside 10 min at t=4 (events 0,2,4)
    rows += [(1, m(0)), (1, m(2)), (1, m(4))]
    # ... and a SECOND burst later that must not re-alert
    rows += [(1, m(60)), (1, m(61)), (1, m(62))]
    # user 2: crossing happens via two PEERS at the same timestamp —
    # the alert count must include both (cnt=4 >= 3 at m(8))
    rows += [(2, m(0)), (2, m(5)), (2, m(8)), (2, m(8))]
    # user 3: never 3 events within 10 minutes
    rows += [(3, m(0)), (3, m(30)), (3, m(60))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    d = str(tmp_path / "alert_events")
    shard_table_to_dir(ev, d, num_shards=3, order_col="ts")
    alerts = threshold_alert_stream(
        stream_parquet_dir(spark, d), window="10 minutes", min_events=3
    )
    from streaming_ml_with_ksql_spark.streaming.sinks import run_to_memory

    got = {
        r.user_id: (r.alert_ts, r.n_events)
        for r in run_to_memory(alerts, "alerts_sem_test").collect()
    }
    assert got == {1: (m(4), 3), 2: (m(8), 4)}  # one alert each; 3 silent


def test_threshold_alert_stream_out_of_order(spark, tmp_path):
    """Late arrivals inside the watermark are handled exactly (ADVICE r5):
    a buffered FUTURE event must not inflate an earlier window, a late
    event can create a crossing at an already-evaluated position, and
    eviction keeps a watermark_delay margin so a late event's full
    look-back is still in state. Both users replay out of order; the
    expected alerts are the batch RANGE-oracle answers over the full
    event set."""
    import datetime as dt
    import os
    import time

    from streaming_ml_with_ksql_spark.streaming.stateful import (
        threshold_alert_stream,
    )

    t0 = dt.datetime(2024, 1, 1)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # Global watermark after batch 1 = max event time (12) - delay (5) = 7,
    # so both late events (7.5 and 9) are admissible in batch 2.
    #
    # user 1: batch 1 delivers t=0 and t=8; t=7.5 arrives LATE. True RANGE
    # crossing (N=3, window=10 min): first t with count((t-10, t]) >= 3 is
    # t=8 ({0, 7.5, 8}) — the pre-fix kernel alerted at t=7.5 by counting
    # the buffered future event t=8.
    # user 2: batch 1 delivers t=0,1,12 (plain in-window eviction at t=12
    # would discard 0 and 1); t=9 arrives late. True crossing: t=9
    # ({0, 1, 9}) — reachable only if eviction kept the delay margin.
    b1 = [(1, m(0)), (1, m(8)), (2, m(0)), (2, m(1)), (2, m(12))]
    b2 = [(1, m(7.5)), (2, m(9))]

    d = tmp_path / "ooo_events"
    d.mkdir()
    base = time.time() - 10
    for i, rows in enumerate([b1, b2]):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        sub = str(tmp_path / f"ooo_b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(
            f for f in os.listdir(sub) if f.endswith(".parquet")
        )
        dst = str(d / f"batch-{i}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (base + i, base + i))

    alerts = threshold_alert_stream(
        stream_parquet_dir(spark, str(d)),
        window="10 minutes",
        min_events=3,
        watermark_delay="5 minutes",
    )
    got = {
        r.user_id: (r.alert_ts, r.n_events)
        for r in run_to_memory(alerts, "alerts_ooo_test").collect()
    }
    assert got == {1: (m(8), 3), 2: (m(9), 3)}


def test_threshold_alert_randomized_out_of_order_equivalence(spark, tmp_path):
    """Randomized (seeded) replay equivalence: random per-user event sets,
    split into two micro-batches with watermark-admissible late movers,
    must emit EXACTLY the batch RANGE-oracle alert set (first t with
    count((t - w, t]) >= N, peers included) computed independently in
    pure Python."""
    import datetime as dt
    import os
    import random
    import time

    from streaming_ml_with_ksql_spark.streaming.stateful import (
        threshold_alert_stream,
    )

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 1)
    W_MIN, DELAY_MIN, N = 30, 5, 4

    def oracle(ts_list):
        ts = sorted(ts_list)
        for t in sorted(set(ts)):
            cnt = sum(1 for x in ts if t - W_MIN < x <= t)
            if cnt >= N:
                return (t, cnt)
        return None

    for trial in range(3):
        users = {}
        for u in range(1, 5):
            n = rng.randint(5, 12)
            users[u] = sorted(rng.randint(0, 120) for _ in range(n))
        all_events = sorted(
            ((u, m) for u, ms in users.items() for m in ms),
            key=lambda x: (x[1], x[0]),
        )
        cut = len(all_events) * 2 // 3
        b1, b2 = list(all_events[:cut]), list(all_events[cut:])
        # move watermark-admissible stragglers from b1 into b2: after b1
        # the watermark is max(b1 ts) - DELAY, so anything strictly newer
        # may arrive late without being dropped
        max_b1 = max(m for _, m in b1)
        movers = [e for e in b1 if e[1] > max_b1 - DELAY_MIN and e[1] != max_b1]
        for e in movers[: rng.randint(1, 3)]:
            b1.remove(e)
            b2.append(e)
        rng.shuffle(b2)

        d = tmp_path / f"rand_{trial}"
        d.mkdir()
        base = time.time() - 10
        for i, rows in enumerate([b1, b2]):
            df = spark.createDataFrame(
                [(u, t0 + dt.timedelta(minutes=m)) for u, m in rows],
                "user_id long, ts timestamp",
            )
            sub = str(tmp_path / f"rand_{trial}_b{i}")
            df.coalesce(1).write.mode("overwrite").parquet(sub)
            part = next(f for f in os.listdir(sub) if f.endswith(".parquet"))
            dst = str(d / f"batch-{i}.parquet")
            os.rename(os.path.join(sub, part), dst)
            os.utime(dst, (base + i, base + i))

        alerts = threshold_alert_stream(
            stream_parquet_dir(spark, str(d)),
            window=f"{W_MIN} minutes",
            min_events=N,
            watermark_delay=f"{DELAY_MIN} minutes",
        )
        got = {
            r.user_id: (r.alert_ts, r.n_events)
            for r in run_to_memory(
                alerts, f"alerts_rand_{trial}"
            ).collect()
        }
        want = {}
        for u, ms in users.items():
            o = oracle(ms)
            if o is not None:
                want[u] = (t0 + dt.timedelta(minutes=o[0]), o[1])
        assert got == want, f"trial {trial}: {got} != {want}"


def test_kafka_seam_drives_runbook_unchanged(spark, tmp_path, monkeypatch):
    """VERDICT r6 #7: exercise the Kafka seam mechanically. A monkeypatched
    ``readStream.format("kafka")`` serves a file-replayed topic whose rows
    carry the EXACT kafka source schema (key/value/topic/partition/offset/
    timestamp/timestampType) with genuine Confluent-framed Avro values.
    ``kafka_stream`` then feeds the documented downstream wiring — schema
    fetched from the LocalSchemaRegistry by subject, per-row frame-checked
    Avro decode, the flagship hopping-window runbook aggregate — and the
    emission set must equal the plain events file replay, proving a real
    broker swap changes no query."""
    import struct

    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.sources import avro_py
    from streaming_ml_with_ksql_spark.streaming import queries as stream_queries
    from streaming_ml_with_ksql_spark.streaming import sinks as stream_sinks
    from streaming_ml_with_ksql_spark.streaming import source as stream_source

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    reg = avro_py.LocalSchemaRegistry()
    framed = avro_py.encode_confluent(ev, reg, "events")
    topic_dir = str(tmp_path / "topic")
    framed.select(
        F.lit(None).cast("binary").alias("key"),
        "value",
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    ).write.mode("overwrite").parquet(topic_dir)

    reader_cls = type(spark.readStream)
    real_format = reader_cls.format

    class _KafkaShim:
        def __init__(self):
            self._opts = {}

        def option(self, k, v):
            self._opts[k] = v
            return self

        def load(self):
            assert self._opts.get("subscribe") == "events"
            schema = spark.read.parquet(topic_dir).schema
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(topic_dir)
            )

    def fake_format(self, fmt):
        if fmt == "kafka":
            return _KafkaShim()
        return real_format(self, fmt)

    monkeypatch.setattr(reader_cls, "format", fake_format)

    raw = stream_source.kafka_stream(spark, "broker:9092", "events")
    assert raw.isStreaming
    assert {
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    } <= set(raw.columns)

    # consumer wiring: subject -> (id, schema) from the registry, decode
    # with the per-row frame check, then the runbook hopping aggregate
    sid, schema_json = reg.latest("events-value")
    typed = avro_py.decode_avro_py(
        raw.select("value"), schema_json,
        expect_prefix=struct.pack(">bI", 0, sid),
    )
    got = stream_sinks.run_to_memory(
        stream_queries.hopping_window_stream(typed, watermark_delay="2 minutes"),
        "kafka_seam_hopping",
    )

    direct_dir = str(tmp_path / "direct")
    stream_source.shard_table_to_dir(ev, direct_dir, num_shards=4, order_col="ts")
    want = stream_sinks.run_to_memory(
        stream_queries.hopping_window_stream(
            stream_source.stream_parquet_dir(spark, direct_dir),
            watermark_delay="2 minutes",
        ),
        "kafka_seam_hopping_direct",
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b and len(a) > 0
