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


def test_cusum_detects_injected_level_shift(spark):
    """A series flat at 10/day for 15 days then 30/day for 15 days must
    locate the changepoint at the shift boundary (max |CUSUM| on the
    last low day)."""
    rows = []
    eid = 0
    for d in range(30):
        n = 10 if d < 15 else 30
        for _ in range(n):
            rows.append((eid, "k", f"2024-01-{d+1:02d} 12:00:00"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, day_s string"
    ).select("event_id", "event_type", F.col("day_s").cast("timestamp").alias("ts"))
    out = timeseries.cusum_changepoints(df).collect()
    assert len(out) == 1
    assert str(out[0]["change_day"]).startswith("2024-01-15")
    # cusum at day 15: 15 low days * (10*30 - 600) = 15 * -300
    assert out[0]["cusum_d"] == -4500.0


def test_cusum_running_sum_terminates_at_zero(spark, sf_small):
    """The scaled deviations sum to exactly 0 over each key's full span
    (the integer-exactness invariant)."""
    ev = io_mod.load_table(spark, sf_small, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"), F.sum("cnt").alias("t")
    )
    z = (
        daily.join(st, "event_type")
        .groupBy("event_type")
        .agg(F.sum(F.col("cnt") * F.col("d") - F.col("t")).alias("z"))
        .collect()
    )
    assert all(r["z"] == 0 for r in z)


def test_autocorr_perfect_periodicity(spark):
    """A strict period-2 series has acf(2)=1, acf(4)=1 and negative odd
    lags."""
    rows = [(t, 100 if t % 2 == 0 else 200) for t in range(40)]
    df = spark.createDataFrame(rows, "t long, x long")
    out = {
        int(r["lag_d"]): r["acf"]
        for r in timeseries.autocorrelation(df, max_lag=4).collect()
    }
    assert out[2] == 1.0 and out[4] == 1.0
    assert out[1] < -0.9 and out[3] < -0.9


def test_autocorr_constant_series_guard(spark):
    df = spark.createDataFrame([(t, 5) for t in range(10)], "t long, x long")
    out = timeseries.autocorrelation(df, max_lag=2).collect()
    assert all(r["acf"] == 0.0 for r in out)


def test_life_table_invariants(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = (
        _REGISTRY["user_life_table"].spark(spark, sf_small)
        .toPandas()
        .sort_values("tenure_d")
    )
    ev = io_mod.load_table(spark, sf_small, "events")
    n_users = ev.select("user_id").distinct().count()
    # the smallest tenure's at-risk set is everyone
    assert out["n_risk_d"].iloc[0] == n_users
    # at-risk counts strictly decrease and each day's exits are bounded
    assert (out["n_risk_d"].diff().dropna() < 0).all()
    assert (out["d_churn_d"] + out["c_cens_d"] <= out["n_risk_d"]).all()
    assert (out["d_churn_d"] + out["c_cens_d"]).sum() == n_users


def test_tfidf_top_terms_ranking_and_counts(spark, sf_small):
    from streaming_ml_with_ksql_spark.operators import text as text_ops

    docs = io_mod.load_table(spark, sf_small, "documents")
    out = text_ops.tfidf_top_terms(docs, k=3).toPandas()
    # scores non-increasing within each doc
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("rnk")
        assert (g["tfidf"].diff().dropna() <= 0).all()
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
    # spot-check tf for one (doc, term) against a direct count
    row = out.iloc[0]
    doc_text = (
        docs.filter(F.col("doc_id") == int(row["doc_id"]))
        .collect()[0]["text"]
        .lower()
        .strip()
    )
    assert doc_text.split().count(row["term"]) == row["tf_d"]


def test_priority_sample_weighted_and_deterministic(spark, sf_small):
    from streaming_ml_with_ksql_spark.operators import text as text_ops

    docs = io_mod.load_table(spark, sf_small, "documents")
    a = text_ops.priority_sample(docs, k=100).toPandas()
    b = text_ops.priority_sample(docs, k=100).toPandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert len(a) == 100
    # weighting: the length-weighted sample over-represents long docs
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert a["n_chars_d"].mean() > mean_all
    # re-salting redraws the sample
    c = text_ops.priority_sample(docs, k=100, salt="other").toPandas()
    assert set(a["doc_id"]) != set(c["doc_id"])


def test_priority_sample_plans_top_k(spark, sf_small):
    from streaming_ml_with_ksql_spark import registry

    df = registry._REGISTRY["weighted_sample_documents"].spark(spark, sf_small)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_key_skew_profile_hand_computed(spark):
    """Counts {a:1, b:1, c:2, d:4}: K=4, T=8, sorted x=[1,1,2,4],
    S1=1+2+6+16=25, Gini=(50-40)/32=0.3125 -> 312500 ppm; p50=1 (rank 2),
    p99=4 (rank 4); top1 share = 4/8 = 500000 ppm."""
    rows = (
        [(1, "a")] + [(2, "b")] + [(3, "c")] * 2 + [(4, "d")] * 4
    )
    df = spark.createDataFrame(
        [(i, k) for i, (i2, k) in enumerate(rows) for i2 in [i2]],
        "rid long, key string",
    )
    counts = df.groupBy("key").agg(F.count(F.lit(1)).alias("c")).toPandas()
    assert sorted(counts["c"]) == [1, 1, 2, 4]

    import duckdb

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    # run the Spark side on a synthetic lineitem stand-in via a temp dir
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        for t in ("lineitem",):
            df.select(
                F.col("key").alias("l_suppkey"),
                F.col("rid").alias("l_orderkey"),
            ).write.parquet(os.path.join(tmp, f"{t}.parquet"))
        out = _REGISTRY["key_skew_profile"].spark(spark, tmp).collect()[0]
    assert out["n_keys_d"] == 4.0
    assert out["n_rows_d"] == 8.0
    assert out["max_key_rows_d"] == 4.0
    assert out["top1_share_ppm_d"] == 500000.0
    assert out["p50_key_rows_d"] == 1.0
    assert out["p99_key_rows_d"] == 4.0
    assert out["gini_ppm_d"] == 312500.0


def test_key_skew_profile_uniform_gini_zero(spark):
    rows = [(i, f"k{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "rid long, key string")
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    with tempfile.TemporaryDirectory() as tmp:
        df.select(
            F.col("key").alias("l_suppkey"), F.col("rid").alias("l_orderkey")
        ).write.parquet(os.path.join(tmp, "lineitem.parquet"))
        out = _REGISTRY["key_skew_profile"].spark(spark, tmp).collect()[0]
    assert out["gini_ppm_d"] == 0.0
    assert out["p50_key_rows_d"] == out["p99_key_rows_d"] == 10.0


def test_pagerank_star_hub_dominates_and_clique_uniform(spark):
    from streaming_ml_with_ksql_spark.operators import graph as graph_ops

    # star: 0 - {1..6}
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "doc_a long, doc_b long"
    )
    pr = {r["node"]: r["pr"] for r in graph_ops.pagerank(star, iters=6).collect()}
    assert all(pr[0] > pr[i] for i in range(1, 7))
    assert len(set(pr[i] for i in range(1, 7))) == 1
    # 4-clique: perfectly symmetric -> identical integer ranks
    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "doc_a long, doc_b long",
    )
    prc = [r["pr"] for r in graph_ops.pagerank(clique, iters=6).collect()]
    assert len(set(prc)) == 1
    # mass approximately conserved (truncation only loses ulps)
    assert 0.95 * 10**12 < sum(prc) <= 10**12


def test_pagerank_partitioning_invariant(spark):
    """Integer fixed-point: the ranks must be bit-identical under any
    input partitioning (the property float PageRank lacks)."""
    from streaming_ml_with_ksql_spark.operators import graph as graph_ops

    edges = [(a, b) for a in range(10) for b in range(a + 1, 10) if (a + b) % 3]
    df1 = spark.createDataFrame(edges, "doc_a long, doc_b long")
    df2 = df1.repartition(7)
    r1 = sorted(
        (r["node"], r["pr"]) for r in graph_ops.pagerank(df1, iters=5).collect()
    )
    r2 = sorted(
        (r["node"], r["pr"]) for r in graph_ops.pagerank(df2, iters=5).collect()
    )
    assert r1 == r2


def test_streaming_postings_equals_batch(spark, sf_small):
    """batch≡stream: the replayed-ingest index must equal the one-shot
    batch build row for row."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    streamed = _REGISTRY["streaming_postings_ingest"].spark(spark, sf_small)
    batch = _REGISTRY["term_postings_index"].spark(spark, sf_small)
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_entity_groups_cover_all_names_transitively(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = _REGISTRY["part_entity_groups"].spark(spark, sf_small).toPandas()
    names = (
        io_mod.load_table(spark, sf_small, "part")
        .select("p_name")
        .distinct()
        .count()
    )
    assert len(out) == names
    # entity_id is a member of its own group, and sizes are consistent
    sizes = out.groupby("entity_id")["p_name"].count()
    for eid, grp in out.groupby("entity_id"):
        assert (grp["group_size_d"] == sizes[eid]).all()
        assert eid in set(grp["p_name"])
        assert eid == grp["p_name"].min()


def test_cluster_quality_separates_synthetic_clusters(spark):
    """Two tight, well-separated synthetic clusters: intra-distance is
    tiny, nearest-centroid distance is huge, labels point at each
    other."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        lbl = i % 2
        base = 0.0 if lbl == 0 else 10.0
        rows.append(
            (i, [base + rng.uniform(-0.01, 0.01) for _ in range(4)], lbl)
        )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from streaming_ml_with_ksql_spark.operators import similarity as sim_ops

    out = {
        int(r["label_d"]): r for r in sim_ops.cluster_quality(df).collect()
    }
    assert out[0]["nearest_label_d"] == 1.0
    assert out[1]["nearest_label_d"] == 0.0
    assert out[0]["n_d"] == 20.0
    # separation ~ 4 dims * 100 * 1e9 nano-units; cohesion < 1e6
    assert out[0]["nearest_dist_nano_d"] > 1e11
    assert out[0]["intra_mean_nano_d"] < 1e6


def test_copurchase_lift_hand_computed(spark):
    """3 orders: {1,2}, {1,2}, {1,3}. pair(1,2): n_ab=2, n_1=3, n_2=2,
    N=3 -> lift = 2*3/(3*2) = 1.0; pair(1,3) support 1 filtered out."""
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "lineitem.parquet"))
        out = _REGISTRY["copurchase_lift"].spark(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"]) == (1, 2)
    assert r["n_ab_d"] == 2.0 and r["lift"] == 1.0


def test_bigram_collocations_finds_glued_phrase(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = _REGISTRY["bigram_collocations"].spark(spark, sf_small).toPandas()
    assert len(out) == 20
    assert (out["n_ab_d"] >= 5).all()
    # lift of the top hit strictly dominates rank 20, and all lifts > 0
    assert out["lift"].iloc[0] >= out["lift"].iloc[-1] > 0


def test_ab_test_lift_consistency(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    r = _REGISTRY["ab_test_lift"].spark(spark, sf_small).collect()[0]
    ev = io_mod.load_table(spark, sf_small, "events")
    n_users = ev.select("user_id").distinct().count()
    assert r["n1_d"] + r["n0_d"] == n_users
    assert 0 <= r["x1_d"] <= r["n1_d"] and 0 <= r["x0_d"] <= r["n0_d"]
    # degenerate pooled proportions emit exactly 0.0 (the ANSI guard)
    if r["x1_d"] + r["x0_d"] in (0, n_users):
        assert r["z_stat"] == 0.0


def test_k_anonymity_groups_are_complete(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = _REGISTRY["k_anonymity_report"].spark(spark, sf_small).toPandas()
    cust = io_mod.load_table(spark, sf_small, "customer")
    direct = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .filter(F.col("count") < 10)
        .count()
    )
    assert len(out) == direct
    assert (out["n_d"] < 10).all()


def test_proto_wire_corrupt_payload_fails_loudly(spark):
    """Truncated varints / fixed64 / lengths raise the avro_py-style
    clear ValueError, never IndexError; unknown fields are skipped."""
    import pytest as _pytest

    from streaming_ml_with_ksql_spark.sources import proto_py

    fields = [(1, "a", "int64"), (2, "b", "double"), (3, "c", "string")]
    good = proto_py._encode_row({"a": -5, "b": 1.5, "c": "hi"}, fields)
    out = proto_py._decode_payload(good, fields)
    assert out == {"a": -5, "b": 1.5, "c": "hi"}
    # negative int64 = ten-byte varint per spec
    assert len(good) > 10
    with _pytest.raises(ValueError, match="truncated"):
        proto_py._decode_payload(good[:-1], fields)
    with _pytest.raises(ValueError, match="truncated"):
        proto_py._decode_payload(bytes([0x08, 0xFF]), fields)  # cut varint
    # unknown field (number 9, varint) skipped cleanly
    unknown = bytes([0x48, 0x07]) + good
    assert proto_py._decode_payload(unknown, fields)["a"] == -5


def test_proto_null_is_absent_field(spark):
    from streaming_ml_with_ksql_spark.sources import proto_py

    fields = [(1, "a", "int64"), (2, "c", "string")]
    enc = proto_py._encode_row({"a": None, "c": "x"}, fields)
    # only field 2 on the wire
    assert enc[0] >> 3 == 2
    assert proto_py._decode_payload(enc, fields) == {"a": None, "c": "x"}


def test_streaming_transition_matrix_equals_batch(spark, sf_small):
    """batch≡stream: the per-user last-event state machine's drained
    matrix must equal the batch lag-window matrix row for row."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    streamed = _REGISTRY["streaming_transition_matrix"].spark(spark, sf_small)
    batch = _REGISTRY["event_transition_matrix"].spark(spark, sf_small)
    cols = ["prev_type", "next_type", "n_d", "prob_ppm_d"]
    assert streamed.select(cols).exceptAll(batch.select(cols)).isEmpty()
    assert batch.select(cols).exceptAll(streamed.select(cols)).isEmpty()


def test_confluent_proto_frame_mixed_id_fails_loudly(spark):
    from streaming_ml_with_ksql_spark.sources import avro_py, proto_py

    fields = [(1, "a", "int64")]
    df = spark.createDataFrame([(1,), (2,)], "a long")
    reg = avro_py.LocalSchemaRegistry()
    framed = proto_py.encode_confluent_proto(df, reg, "t1", fields)
    # register a second subject so ids diverge, then splice a frame with
    # the wrong id into the stream
    reg.register("t2-value", "[]")
    import struct as _s

    from pyspark.sql import functions as _F

    bad_frame = _s.pack(">bIb", 0, 99, 0)
    poisoned = framed.unionByName(
        framed.limit(1).select(
            _F.concat(
                _F.lit(bad_frame), _F.col("payload").substr(7, 10000)
            ).alias("payload")
        )
    )
    import pytest as _pytest

    decoded = proto_py.decode_confluent_proto(poisoned, reg, "a bigint")
    with _pytest.raises(Exception, match="frame mismatch|mixed-id"):
        decoded.collect()


def test_streaming_auc_equals_batch(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    s = _REGISTRY["streaming_auc_ingest"].spark(spark, sf_small).collect()[0]
    b = _REGISTRY["roc_auc_purchase"].spark(spark, sf_small).collect()[0]
    assert s.asDict() == b.asDict()


def test_roc_auc_single_class_guard(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, y int")
    out = ml_metrics.roc_auc_binary(df, F.col("y"), F.col("score")).collect()[0]
    assert out["auc"] == 0.0 and out["nneg_d"] == 0.0


def test_ses_forecast_tracks_level_shift(spark):
    """SES on a step series converges toward the new level; the naive
    mean would sit between the plateaus."""
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    rows = []
    ok = 0
    for d in range(40):
        price = 100_000.0 if d < 20 else 300_000.0
        for _ in range(10):
            rows.append((ok, float(price), f"1995-01-{(d % 28) + 1:02d}"))
            ok += 1
    # spread over consecutive days via explicit date arithmetic
    rows = []
    ok = 0
    import datetime

    base = datetime.datetime(1995, 1, 1)
    for d in range(40):
        price = 100_000.0 if d < 20 else 300_000.0
        for _ in range(10):
            rows.append((ok, price, base + datetime.timedelta(days=d)))
            ok += 1
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        out = _REGISTRY["ses_forecast_revenue"].spark(spark, tmp).collect()[0]
    assert out["n_days_d"] == 40.0
    # 10 orders/day: low plateau 1000 k$, high plateau 3000 k$; after 20
    # days at the high level the smoothed level is within 2% of 3000
    assert 2940 <= out["forecast_kusd_d"] <= 3000


def test_theil_sen_ignores_one_contaminated_day(spark):
    """A clean slope-2 series with one wildly corrupted day: Theil-Sen
    recovers ~2, OLS would not."""
    import datetime
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    base = datetime.datetime(1995, 1, 1)
    rows = []
    ok = 0
    for d in range(30):
        daily_total = 1_000_000.0 + 2_000.0 * d  # slope = 2 k$/day
        if d == 15:
            daily_total = 50_000_000.0  # corrupted day
        rows.append((ok, daily_total, base + datetime.timedelta(days=d)))
        ok += 1
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        out = _REGISTRY["theil_sen_revenue_trend"].spark(spark, tmp).collect()[0]
    assert out["n_pairs_d"] == 30 * 29 / 2
    assert 1.5 <= out["slope_med"] <= 2.5


def test_benford_terms_reconstruct_counts(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = (
        _REGISTRY["benford_first_digit"].spark(spark, sf_small)
        .toPandas()
        .sort_values("digit_d")
    )
    assert list(out["digit_d"]) == list(map(float, range(1, 10)))
    assert out["n_d"].sum() == out["total_d"].iloc[0]
    assert (out["chi2_term"] >= 0).all()


def test_spearman_monotone_and_ties(spark):
    """rho = 1 for any monotone map, -1 reversed, and the tie-corrected
    value matches pandas' spearman on a tied sample."""
    rows = [(float(i), float(i * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = ml_metrics.spearman_correlation(
        df, F.col("x"), F.col("y"), quantize=10
    ).collect()[0]
    # identical rank vectors: rho = d/(sqrt(d)*sqrt(d)) = 1 +/- 1 ulp
    assert abs(out["rho"] - 1.0) < 1e-12
    out2 = ml_metrics.spearman_correlation(
        df, F.col("x"), -F.col("y"), quantize=10
    ).collect()[0]
    assert abs(out2["rho"] + 1.0) < 1e-12

    import random

    rng = random.Random(3)
    tied = [(float(rng.randint(0, 5)), float(rng.randint(0, 5))) for _ in range(200)]
    tdf = spark.createDataFrame(tied, "x double, y double")
    got = ml_metrics.spearman_correlation(
        tdf, F.col("x"), F.col("y"), quantize=1
    ).collect()[0]["rho"]
    pdf = pd.DataFrame(tied, columns=["x", "y"])
    expected = pdf["x"].rank().corr(pdf["y"].rank())  # tie-avg Pearson-on-ranks
    assert abs(got - expected) < 1e-12


def test_mann_kendall_detects_increasing_trend(spark):
    import datetime
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    base = datetime.datetime(1995, 1, 1)
    rows = [
        (d, 1_000_000.0 + 5_000.0 * d, base + datetime.timedelta(days=d))
        for d in range(30)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        out = _REGISTRY["mann_kendall_revenue"].spark(spark, tmp).collect()[0]
    # strictly increasing: S = n(n-1)/2, z strongly positive
    assert out["s_d"] == 30 * 29 / 2
    assert out["z_stat"] > 5


def test_mann_kendall_constant_series_guarded(spark):
    import datetime
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    base = datetime.datetime(1995, 1, 1)
    rows = [
        (d, 2_000_000.0, base + datetime.timedelta(days=d)) for d in range(10)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        out = _REGISTRY["mann_kendall_revenue"].spark(spark, tmp).collect()[0]
    assert out["s_d"] == 0.0 and out["var18_d"] == 0.0 and out["z_stat"] == 0.0


def test_hbos_surfaces_planted_rarity(spark):
    """One event in a never-used hour with an extreme value dominates
    the rarity ranking."""
    import datetime
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(seconds=i), i % 7, "click", 100.0, "{}")
        for i in range(500)
    ]
    # planted anomaly: unique hour (03), extreme value bin, rare type
    rows.append(
        (999, datetime.datetime(2024, 1, 2, 3, 0, 0), 1, "refund", 480.0, "{}")
    )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = _REGISTRY["hbos_outlier_events"].spark(spark, tmp).collect()
    assert out[0]["event_id"] == 999
    assert out[0]["rarity_ppm_d"] > out[1]["rarity_ppm_d"] * 10


def test_winsorized_mean_between_bounds(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = _REGISTRY["winsorized_value_stats"].spark(spark, sf_small).toPandas()
    assert (out["lo"] <= out["win_mean"]).all()
    assert (out["win_mean"] <= out["hi"]).all()
    ev = io_mod.load_table(spark, sf_small, "events")
    assert out["n_d"].sum() == ev.count()


def test_ks_identical_and_shifted_samples(spark):
    """KS ~ 0 for an identical split, large for a shifted one."""
    import datetime
    import os
    import tempfile

    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    sat = datetime.datetime(2024, 1, 6, 12, 0)  # Saturday
    mon = datetime.datetime(2024, 1, 8, 12, 0)  # Monday

    def run(weekend_vals, weekday_vals):
        rows = []
        for i, v in enumerate(weekend_vals):
            rows.append((i, sat, 1, "click", float(v), "{}"))
        for i, v in enumerate(weekday_vals):
            rows.append((10_000 + i, mon, 1, "click", float(v), "{}"))
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "events.parquet"))
            return (
                _REGISTRY["ks_weekend_value_drift"].spark(spark, tmp)
                .collect()[0]
            )

    same = run(range(100), range(100))
    assert same["ks_ppm_d"] == 0.0
    shifted = run(range(100), range(200, 300))
    assert shifted["ks_ppm_d"] == 1_000_000.0  # disjoint supports: D = 1


def test_chi2_marginals_reconstruct(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    out = _REGISTRY["chi2_type_weekday"].spark(spark, sf_small).toPandas()
    ev = io_mod.load_table(spark, sf_small, "events")
    assert out["o_d"].sum() == ev.count()
    # expected sums match observed sums per margin (chi2 table property)
    assert abs(out["expected"].sum() - out["o_d"].sum()) < 1e-6
    assert (out["chi2_term"] >= 0).all()


def test_streaming_ks_equals_batch(spark, sf_small):
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    s = _REGISTRY["streaming_ks_ingest"].spark(spark, sf_small).collect()[0]
    b = _REGISTRY["ks_weekend_value_drift"].spark(spark, sf_small).collect()[0]
    assert s.asDict() == b.asDict()
