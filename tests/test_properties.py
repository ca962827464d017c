"""Property-based invariants (hypothesis over small generated frames).

The DuckDB oracles check equivalence on the fixed testdata; these check
*algebraic invariants* on adversarial inputs — empty groups, equal
timestamps, single rows, all-duplicates — where differential tests on
one dataset can't reach.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark.operators import joins, windows
from streaming_ml_with_ksql_spark.operators.dedup import dedup_exact, latest_per_key

BASE = dt.datetime(2024, 1, 1)

# (user_id, seconds-offset, event_type) rows
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=7200),
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=60,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _events_df(spark, rows):
    data = [
        (i, uid, BASE + dt.timedelta(seconds=s), et)
        for i, (uid, s, et) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


@given(rows=events_strategy)
@_SETTINGS
def test_hopping_window_conservation(spark, rows):
    """Every event lands in exactly size/slide = 5 windows ⇒ the sum of
    per-window event counts is exactly 5× the input rows, and every
    window's [start, end) actually contains its events' time range."""
    df = _events_df(spark, rows)
    agg = windows.hopping_window_agg(df)
    total = agg.agg(F.sum("n_events")).collect()[0][0]
    assert total == 5 * len(rows)
    bad = agg.filter(
        (F.col("first_ts") < F.col("window_start"))
        | (F.col("last_ts") >= F.col("window_end"))
        | (F.col("first_ts") > F.col("last_ts"))
    )
    assert bad.count() == 0


@given(rows=events_strategy)
@_SETTINGS
def test_latest_per_key_is_idempotent_and_complete(spark, rows):
    """latest_per_key returns exactly one row per distinct key, that row
    exists in the input, and applying the operator twice is a no-op."""
    df = _events_df(spark, rows)
    latest = latest_per_key(df, "user_id", "ts", tiebreak="event_id")
    n_keys = df.select("user_id").distinct().count()
    assert latest.count() == n_keys
    # every output row is an input row
    assert latest.exceptAll(df).count() == 0
    again = latest_per_key(latest, "user_id", "ts", tiebreak="event_id")
    assert again.exceptAll(latest).count() == 0 and again.count() == latest.count()
    # the picked row's ts is the max ts of its key
    maxes = df.groupBy("user_id").agg(F.max("ts").alias("mx"))
    joined = latest.join(maxes, "user_id")
    assert joined.filter(F.col("ts") != F.col("mx")).count() == 0


@given(rows=events_strategy)
@_SETTINGS
def test_dedup_exact_partitions_input(spark, rows):
    """Survivors are 1:1 with distinct content fingerprints; each survivor
    is the min-id row of its content group."""
    df = _events_df(spark, rows)
    out = dedup_exact(df, ["user_id", "event_type"], id_col="event_id")
    n_contents = df.select("user_id", "event_type").distinct().count()
    assert out.count() == n_contents
    mins = df.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("event_id")
    )
    assert out.select("event_id").exceptAll(mins.select("event_id")).count() == 0


@given(rows=events_strategy)
@_SETTINGS
def test_as_of_join_matches_bruteforce(spark, rows):
    """The single-shuffle merge as-of join equals the brute-force
    definition (greatest right_ts <= left_ts, ties by greatest tiebreak)
    on arbitrary inputs — including equal timestamps on both sides."""
    df = _events_df(spark, rows)
    left = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = df.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    got = joins.as_of_join(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="view_ts",
        payload_cols=("view_event_id", "view_ts"),
        tiebreak="view_event_id",
    )
    # brute force: rank all (purchase, view<=) pairs
    from pyspark.sql import Window

    cand = left.join(right, "user_id").filter(F.col("view_ts") <= F.col("ts"))
    w = Window.partitionBy("event_id").orderBy(
        F.col("view_ts").desc(), F.col("view_event_id").desc()
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "view_event_id", "view_ts")
    )
    expected = left.join(best, "event_id", "left").select(
        "event_id", "user_id", "ts", "view_event_id", "view_ts"
    )
    g = sorted(map(tuple, got.select(*expected.columns).collect()))
    e = sorted(map(tuple, expected.collect()))
    assert g == e


@pytest.mark.parametrize("how", ["left", "inner"])
def test_salted_join_equals_plain_join(spark, how):
    """Salting changes routing, never results."""
    facts = _events_df(
        spark, [(i % 3, i, "view") for i in range(40)]
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (5, "z")], "k long, name string"
    )
    salted = joins.salted_join(facts, dim, "user_id", "k", salt=4, how=how)
    plain = facts.join(dim, facts.user_id == dim.k, how)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salt_is_stable_under_recomputation(spark):
    """The per-row salt must derive from row CONTENT (hash of the fact
    columns), not from monotonically_increasing_id — a task retry that
    re-enumerates rows must land every row in the same bucket it had
    before, or a mid-job recomputation could duplicate/drop join rows."""
    from pyspark.sql import functions as F

    facts = _events_df(spark, [(i % 3, i, "view") for i in range(40)])
    salt_expr = F.pmod(F.hash(*[F.col(c) for c in facts.columns]), F.lit(4))
    # two independent evaluations (separate jobs, shuffled input order)
    a = sorted(
        map(tuple, facts.withColumn("s", salt_expr).repartition(7).collect())
    )
    b = sorted(
        map(tuple, facts.withColumn("s", salt_expr).repartition(3).collect())
    )
    assert a == b


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),   # start offset (s)
        st.integers(min_value=-600, max_value=7200),  # length (s) — may be <= 0
    ),
    min_size=0,
    max_size=12,
)


@given(rows=events_strategy, ivals=intervals_strategy)
@_SETTINGS
def test_range_bucket_join_equals_naive_containment(spark, rows, ivals):
    """Bucketing is a pure pruning rewrite: against ANY interval set —
    empty, degenerate (length <= 0), bucket-spanning, overlapping — the
    bucketed join must return exactly the rows of the naive
    cross-join-and-filter containment, including multiplicity when an
    event falls in several intervals."""
    facts = _events_df(spark, rows)
    idata = [
        (j, BASE + dt.timedelta(seconds=s), BASE + dt.timedelta(seconds=s + ln))
        for j, (s, ln) in enumerate(ivals)
    ]
    intervals = spark.createDataFrame(
        idata, "ival_id long, w_start timestamp, w_end timestamp"
    )
    got = joins.range_bucket_join(
        facts,
        intervals,
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=900,
    ).select("event_id", "ival_id")
    naive = (
        facts.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("event_id", "ival_id")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=40)),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_avro_binary_roundtrip_property(spark, rows):
    """Property: arbitrary (long, nullable unicode string, double incl.
    ±inf, boolean) records survive the pure-Python Avro wire format
    exactly — full 63-bit long range (varint length boundaries), empty
    and multi-byte-unicode strings, and union nulls."""
    from streaming_ml_with_ksql_spark.sources import avro_py

    df = spark.createDataFrame(
        rows, "a long, s string, d double, b boolean"
    )
    schema = avro_py.avro_schema_for(df.schema)
    back = avro_py.decode_avro_py(avro_py.encode_avro_py(df, schema), schema)
    a = sorted(tuple(map(repr, r)) for r in df.collect())
    b = sorted(tuple(map(repr, r)) for r in back.collect())
    assert a == b


@settings(
    max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.booleans(),
            st.integers(min_value=-(2**63), max_value=2**64 - 1),
            st.floats(allow_nan=False),
            st.text(max_size=300),
            st.binary(max_size=300),
        ),
        max_size=20,
    )
)
def test_msgpack_value_roundtrip_property(vals):
    """Every supported scalar round-trips through the canonical
    MessagePack forms, whatever width boundary it sits on."""
    from streaming_ml_with_ksql_spark.sources import msgpack_py as mp

    out = bytearray()
    for v in vals:
        mp.pack_value(v, out)
    data = bytes(out)
    pos, got = 0, []
    while pos < len(data):
        v, pos = mp.unpack_value(data, pos)
        got.append(v)
    assert got == vals
    assert pos == len(data)


@settings(
    max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.binary(min_size=0, max_size=8000))
def test_gif_lzw_roundtrip_property(data):
    """The LZW codec inverts itself on arbitrary byte streams (any
    alphabet mix, any repetition structure, table resets included)."""
    from streaming_ml_with_ksql_spark.operators import multimodal as mm

    assert mm._lzw_decompress(mm._lzw_compress(data, 8), 8) == data
