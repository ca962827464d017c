"""Round-7 continuation (third block) tests: DBSCAN semantic properties
beyond the oracle hash (which scripts/verify_driver.py covers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import clustering, similarity


def _dbscan(spark, pairs, n_vertices, min_neighbors=2):
    verts = spark.range(n_vertices).select(F.col("id").alias("vec_id"))
    df = spark.createDataFrame(pairs, "vec_a long, vec_b long")
    return {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in clustering.dbscan_from_pairs(
            verts, df, min_neighbors=min_neighbors
        ).collect()
    }


def test_dbscan_core_border_noise_classification(spark):
    """Triangle 0-1-2 with pendant 3 off vertex 2; 4 and 5 isolated:
    0/1/2 are core (>=2 neighbors), 3 is border (1 neighbor, which is
    core), 4/5 are noise. Cluster id = min core id = 0."""
    out = _dbscan(spark, [(0, 1), (0, 2), (1, 2), (2, 3)], 6)
    assert out[0] == ("core", 0)
    assert out[1] == ("core", 0)
    assert out[2] == ("core", 0)
    assert out[3] == ("border", 0)
    assert out[4] == ("noise", -1)
    assert out[5] == ("noise", -1)


def test_dbscan_two_clusters_not_bridged_by_border(spark):
    """Two triangles {0,1,2} and {10,11,12} joined only through the
    degree-2 bridge path 2-5, 5-10: vertex 5 has two CORE neighbors in
    DIFFERENT clusters — it is itself core (2 neighbors) so it merges
    them? No: 5's neighbors are 2 and 10, so 5 IS core at
    min_neighbors=2 and the whole graph is one cluster. At
    min_neighbors=3, 5 drops to border and the clusters stay separate —
    the classic DBSCAN density-bridge distinction."""
    pairs = [
        (0, 1), (0, 2), (1, 2),
        (10, 11), (10, 12), (11, 12),
        (2, 5), (5, 10),
    ]
    merged = _dbscan(spark, pairs, 13, min_neighbors=2)
    assert merged[5] == ("core", 0)
    assert merged[10] == ("core", 0)

    split = _dbscan(spark, pairs, 13, min_neighbors=3)
    # only 2 and 10 reach 3 neighbors; they are disconnected core-wise
    assert split[2] == ("core", 2)
    assert split[10] == ("core", 10)
    assert split[5][0] == "border" and split[5][1] in (2, 10)
    # min rule makes the border assignment deterministic
    assert split[5][1] == 2
    assert split[0][0] == "border" and split[11][0] == "border"


def test_dbscan_partitioning_invariant(spark):
    """Roles and labels are min-folds over integers — identical under
    any input partitioning."""
    pairs = [(a, b) for a in range(15) for b in range(a + 1, 15) if (a + b) % 4 == 1]
    verts = spark.range(20).select(F.col("id").alias("vec_id"))
    df1 = spark.createDataFrame(pairs, "vec_a long, vec_b long")
    df2 = df1.repartition(7)
    r1 = sorted(map(tuple, clustering.dbscan_from_pairs(verts, df1).collect()))
    r2 = sorted(map(tuple, clustering.dbscan_from_pairs(verts, df2).collect()))
    assert r1 == r2


def test_dbscan_embeddings_invariants(spark, sf_small):
    """On the real embeddings table: every vertex is labeled exactly
    once; core cluster ids are core vertex ids; border points touch a
    core neighbor's cluster; noise is -1."""
    emb = io_mod.load_table(spark, sf_small, "embeddings")
    pairs = similarity.embedding_near_dup_pairs_blocked(emb)
    out = clustering.dbscan_from_pairs(emb, pairs, min_neighbors=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    core_ids = {r["vec_id"] for r in rows if r["role"] == "core"}
    clusters = {r["cluster_id"] for r in rows if r["role"] == "core"}
    assert clusters <= core_ids  # labels are min CORE ids
    for r in rows:
        if r["role"] == "noise":
            assert r["cluster_id"] == -1
        else:
            assert r["cluster_id"] >= 0
    border = [r for r in rows if r["role"] == "border"]
    assert all(r["cluster_id"] in clusters for r in border)


def _holt_replay(xs):
    """Pure-Python replay of the registered Holt recursion."""
    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    l, b = xs[0] * 1000, (xs[1] - xs[0]) * 1000
    for v in xs[1:]:
        nl = tdiv(2 * v * 1000 + 8 * (l + b), 10)
        b = tdiv((nl - l) + 9 * b, 10)
        l = nl
    return l, b


def test_holt_matches_python_replay(spark, sf_small):
    from streaming_ml_with_ksql_spark import registry

    orders = io_mod.load_table(spark, sf_small, "orders")
    daily = (
        orders.groupBy(
            F.datediff(
                F.date_trunc("day", F.col("o_orderdate")),
                F.lit("1995-01-01").cast("timestamp"),
            ).alias("t")
        )
        .agg(F.expr("sum(CAST(floor(o_totalprice) AS BIGINT)) div 1000L").alias("x"))
        .orderBy("t")
        .collect()
    )
    xs = [r["x"] for r in daily]
    l, b = _holt_replay(xs)
    row = registry.queries()["holt_forecast_revenue"](spark, sf_small).collect()[0]
    assert row["n_days_d"] == float(len(xs))
    assert row["level_milli_d"] == float(l)
    assert row["trend_milli_d"] == float(b)


def test_holt_tracks_linear_series(spark):
    """On x_t = 100 + 5t the trend state must converge to ~5 units
    (5000 milli) and the level must track the series tail."""
    xs = [100 + 5 * t for t in range(60)]
    l, b = _holt_replay(xs)
    assert abs(b - 5000) <= 20
    assert abs(l - xs[-1] * 1000) <= 2000


def test_user_trend_velocity_matches_python_replay(spark, sf_small):
    """Replay the trailing-7-observation integer OLS per user in pure
    Python from the same daily aggregates and compare every slope."""
    import math
    from collections import defaultdict

    from streaming_ml_with_ksql_spark import registry

    ev = io_mod.load_table(spark, sf_small, "events").where(
        F.col("user_id").isNotNull()
    )
    daily = (
        ev.groupBy(
            "user_id",
            F.datediff(
                F.date_trunc("day", F.col("ts")),
                F.lit("2024-01-01").cast("timestamp"),
            ).alias("x"),
        )
        .agg(F.sum(F.expr("CAST(floor(value * 1000000.0) AS BIGINT)")).alias("y"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["user_id"]].append((r["x"], r["y"]))

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    expect = {}
    for u, pts in series.items():
        pts.sort()
        tail = pts[-7:]
        n = len(tail)
        sx = sum(x for x, _ in tail)
        sy = sum(y for _, y in tail)
        sxy = sum(x * y for x, y in tail)
        sxx = sum(x * x for x, _ in tail)
        den = n * sxx - sx * sx
        slope = None if den == 0 else float(tdiv((n * sxy - sx * sy) * 10**6, den))
        expect[u] = (pts[-1][0], n, slope)

    out = registry.queries()["user_trend_velocity"](spark, sf_small).collect()
    assert len(out) == len(expect)
    for r in out:
        lx, n, slope = expect[r["user_id"]]
        assert r["last_x_d"] == float(lx)
        assert r["n_obs_d"] == float(n)
        if slope is None:
            assert r["slope_ppm_d"] is None
        else:
            assert r["slope_ppm_d"] == slope


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A 10-word excerpt inside a 200-word source: containment of the
    excerpt ~1e6 ppm while jaccard stays far below the 0.5 near-dup
    bar — the pair ngram_jaccard_pairs (threshold 0.5) cannot see."""
    from streaming_ml_with_ksql_spark.operators import text as text_ops

    source_words = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(50, 60))
    unrelated = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, source_words), (2, excerpt), (3, unrelated)],
        "doc_id long, text string",
    )
    rows = text_ops.ngram_containment_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # the excerpt (8 shingles, all inside the source) is fully contained
    assert r["cont_b_in_a_ppm"] == 1_000_000
    assert r["cont_a_in_b_ppm"] < 100_000
    assert r["jaccard_ppm"] < 500_000  # invisible to the jaccard query

    jac = text_ops.ngram_jaccard_pairs(docs).collect()
    assert jac == []  # confirms the asymmetric signal is new information


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_xy2d(spark):
    """The aggregate-fold must equal the classic xy2d recurrence on a
    full 16x16 grid (bits=4, identity scaling via [0, 16) bounds)."""
    from streaming_ml_with_ksql_spark.operators import bucketing

    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "a long, b long")
    out = bucketing.hilbert_index(
        df, F.col("a"), F.col("b"),
        a_min=0, a_max=16, b_min=0, b_max=16, bits=4,
    ).collect()
    for r in out:
        assert r["hindex"] == _xy2d(16, r["a"], r["b"]), (r["a"], r["b"])
    # bijection over the full grid
    assert sorted(r["hindex"] for r in out) == list(range(256))


def test_hilbert_locality_beats_zorder(spark):
    """Continuity: consecutive Hilbert indexes are ALWAYS spatially
    adjacent (Manhattan distance 1); Z-order takes longer jumps at
    quadrant boundaries. This is the file-pruning locality claim,
    measured."""
    from streaming_ml_with_ksql_spark.operators import bucketing

    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "a long, b long")
    kw = dict(a_min=0, a_max=16, b_min=0, b_max=16, bits=4)
    h = {
        r["hindex"]: (r["a"], r["b"])
        for r in bucketing.hilbert_index(df, F.col("a"), F.col("b"), **kw).collect()
    }
    z = {
        r["zindex"]: (r["a"], r["b"])
        for r in bucketing.zorder_index(df, F.col("a"), F.col("b"), **kw).collect()
    }

    def jumps(ix):
        cells = [ix[i] for i in sorted(ix)]
        return [
            abs(a[0] - b[0]) + abs(a[1] - b[1])
            for a, b in zip(cells, cells[1:])
        ]

    hj, zj = jumps(h), jumps(z)
    assert max(hj) == 1  # the Hilbert curve never tears
    assert max(zj) > 1  # Morton does (diagonal quadrant jumps)
    assert sum(hj) < sum(zj)


def test_session_concurrency_known_overlap(spark, tmp_path):
    """Three users: A 00:00-00:10, B 00:05-00:20, C 01:00 (isolated
    single event). Peak concurrency = 2 (A and B overlap 00:05-00:10);
    C's one-minute session raises the active-minute count only."""
    import datetime as dt

    from streaming_ml_with_ksql_spark import registry

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, minutes in [(1, [0, 10]), (2, [5, 20]), (3, [60])]:
        for m in minutes:
            eid += 1
            rows.append((eid, base + dt.timedelta(minutes=m), uid, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    df.write.parquet(f"{sf}/events.parquet")
    out = registry.queries()["session_concurrency_profile"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    # A spans minutes 0-10 (11), B 5-20 (16), C one minute => active
    # minutes = union {0..20, 60} = 22; session-minutes = 11+16+1 = 28;
    # peak = 2 during the A∩B overlap
    assert r["minutes_active_d"] == 22.0
    assert r["session_minutes_d"] == 28.0
    assert r["peak_concurrent_d"] == 2.0


def test_decision_stump_finds_separating_dimension(spark, tmp_path):
    """Synthetic embeddings where dim 7 perfectly separates the coarse
    classes (label<5 -> coordinate -1.0, else +1.0; every other dim is a
    fixed constant): the stump must select dim 7 with zero Gini cost and
    100% training accuracy."""
    from streaming_ml_with_ksql_spark import registry

    rows = []
    for i in range(80):
        label = i % 10
        vec = [0.5] * 64
        vec[7] = -1.0 if label < 5 else 1.0
        rows.append((i, vec, label))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    df.write.parquet(f"{sf}/embeddings.parquet")
    out = registry.queries()["decision_stump_embedding"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["dim_d"] == 7.0
    assert r["cost_ppm_d"] == 0.0
    assert r["train_acc_ppm_d"] == 1_000_000.0
    assert r["n_left_d"] == 40.0  # the negative-coordinate half


def test_perceptron_converges_on_separable_data(spark):
    """On a linearly separable synthetic set (dim 7 carries the class
    sign, everything else constant) one batch update already separates:
    epoch 0 reports all-wrong under w=0 (y*s<=0 convention), epochs
    1..2 report 100% accuracy."""
    from streaming_ml_with_ksql_spark.ml import linear

    rows = []
    for i in range(80):
        label = i % 10
        vec = [0.5] * 64
        vec[7] = -1.0 if label < 5 else 1.0
        rows.append((i, vec, label))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["epoch_d"]: (r["n_mis_d"], r["acc_ppm_d"])
        for r in linear.batch_perceptron_trajectory(df, epochs=2).collect()
    }
    assert out[0.0] == (80.0, 0.0)
    assert out[1.0] == (0.0, 1_000_000.0)
    assert out[2.0] == (0.0, 1_000_000.0)


def test_perceptron_partitioning_invariant(spark, sf_small):
    """Order-free integer epoch updates: the trajectory must be
    identical under any input partitioning."""
    from streaming_ml_with_ksql_spark import io as io_mod2
    from streaming_ml_with_ksql_spark.ml import linear

    emb = io_mod2.load_table(spark, sf_small, "embeddings")
    r1 = sorted(map(tuple, linear.batch_perceptron_trajectory(emb, epochs=2).collect()))
    r2 = sorted(
        map(
            tuple,
            linear.batch_perceptron_trajectory(emb.repartition(13), epochs=2).collect(),
        )
    )
    assert r1 == r2


def test_fit_stump_batch_equals_scrambled_input(spark, sf_small):
    """The stump is a pure function of the additive (fid, v) histogram:
    any input partitioning/order must fit the identical split."""
    from streaming_ml_with_ksql_spark import registry
    from streaming_ml_with_ksql_spark.ml import linear
    from streaming_ml_with_ksql_spark.registry.q11_round7c import (
        _event_stump_features,
    )

    ev = io_mod.load_table(spark, sf_small, "events")
    a = linear.fit_stump(_event_stump_features(ev)).collect()
    b = linear.fit_stump(
        _event_stump_features(ev.repartition(17).sortWithinPartitions("value"))
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # and the streaming twin shares the batch oracle by construction
    assert (
        registry._REGISTRY["streaming_stump_ingest"].oracle
        == registry._REGISTRY["decision_stump_events"].oracle
    )


def test_depth2_tree_solves_xor_the_stump_cannot(spark, tmp_path):
    """XOR(value-high, hour-high) labels: no single split separates
    (root accuracy ~50%), but the depth-2 children split on the other
    feature and reach 100% each."""
    import datetime as dt

    from streaming_ml_with_ksql_spark import registry

    base = dt.datetime(2024, 1, 5)
    rows = []
    eid = 0
    for vhigh in (0, 1):
        for hhigh in (0, 1):
            y = vhigh ^ hhigh
            for i in range(25):
                eid += 1
                rows.append(
                    (
                        eid,
                        base.replace(hour=20 if hhigh else 3, minute=i),
                        1,
                        "purchase" if y else "view",
                        100.0 if vhigh else 1.0,
                        "{}",
                    )
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    df.write.parquet(f"{sf}/events.parquet")
    out = {
        r["node"]: r
        for r in registry.queries()["decision_tree_depth2_events"](
            spark, sf
        ).collect()
    }
    assert out["root"]["train_acc_ppm_d"] == 500_000.0  # XOR blinds depth 1
    assert out["left"]["train_acc_ppm_d"] == 1_000_000.0
    assert out["right"]["train_acc_ppm_d"] == 1_000_000.0
    # children split on the OTHER feature than the root
    assert out["left"]["fid_d"] != out["root"]["fid_d"]
    assert out["right"]["fid_d"] != out["root"]["fid_d"]


def test_knn_loo_perfect_on_separated_clusters(spark, tmp_path):
    """Three well-separated orthogonal clusters: every point's 5
    nearest neighbors are same-cluster, so LOO accuracy is 100% for
    every class."""
    from streaming_ml_with_ksql_spark import registry

    rows = []
    vid = 0
    for label in range(3):
        for i in range(10):
            vec = [0.0] * 64
            vec[label * 20] = 1.0
            vec[label * 20 + 1] = 0.01 * i  # intra-cluster jitter
            rows.append((vid, vec, label))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    df.write.parquet(f"{sf}/embeddings.parquet")
    out = registry.queries()["knn_loo_classification"](spark, sf).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_d"] == 10.0
        assert r["acc_ppm_d"] == 1_000_000.0


def test_label_propagation_path_rounds_and_majority(spark):
    """Path 0-1-2-3-4 with seed 0 labeled 'en': labels spread one hop
    per round (round field = BFS distance); a contested node with two
    different-label neighbors takes the majority, tie to the smaller
    label."""
    from streaming_ml_with_ksql_spark.operators import graph as graph_ops

    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    seeds = spark.createDataFrame([(0, "en")], "node long, lbl string")
    out = {
        r["node"]: (r["lbl"], r["round"])
        for r in graph_ops.propagate_labels(path, seeds, rounds=3).collect()
    }
    assert out == {0: ("en", 0), 1: ("en", 1), 2: ("en", 2), 3: ("en", 3)}
    # 4 unreached within 3 rounds — absent

    # tie: node 10 adjacent to seeds 'fr' and 'de' -> smallest label
    tri = spark.createDataFrame([(8, 10), (9, 10)], "doc_a long, doc_b long")
    seeds2 = spark.createDataFrame(
        [(8, "fr"), (9, "de")], "node long, lbl string"
    )
    out2 = {
        r["node"]: (r["lbl"], r["round"])
        for r in graph_ops.propagate_labels(tri, seeds2, rounds=1).collect()
    }
    assert out2[10] == ("de", 1)
    # majority beats the tie rule: two 'fr' neighbors vs one 'de'
    tri2 = spark.createDataFrame(
        [(8, 10), (9, 10), (7, 10)], "doc_a long, doc_b long"
    )
    seeds3 = spark.createDataFrame(
        [(7, "fr"), (8, "fr"), (9, "de")], "node long, lbl string"
    )
    out3 = {
        r["node"]: r["lbl"]
        for r in graph_ops.propagate_labels(tri2, seeds3, rounds=1).collect()
    }
    assert out3[10] == "fr"


def test_markov_absorption_monotone_and_bounded(spark, sf_small):
    """Reach probabilities are ppm-bounded and non-decreasing in k
    (adding steps can only add reach mass)."""
    from streaming_ml_with_ksql_spark import registry

    rows = registry.queries()["markov_absorption_purchase"](
        spark, sf_small
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["reach_ppm_d"] <= 1_000_000
    # purchase state reaches itself within 4 steps with high mass on
    # this data (every state's one-step purchase prob is well above 0)
    byname = {r["state"]: r["reach_ppm_d"] for r in rows}
    assert byname.get("purchase", 0) > 0


def test_haar_energy_matches_python_replay(spark, sf_small):
    """The integer Haar pyramid replays exactly in pure Python from the
    same first-32-day series."""
    from streaming_ml_with_ksql_spark import registry
    from streaming_ml_with_ksql_spark import io as io_mod2
    from pyspark.sql import functions as F2

    orders = io_mod2.load_table(spark, sf_small, "orders")
    daily = (
        orders.groupBy(
            F2.datediff(
                F2.date_trunc("day", F2.col("o_orderdate")),
                F2.lit("1995-01-01").cast("timestamp"),
            ).alias("t")
        )
        .agg(F2.expr("sum(CAST(floor(o_totalprice) AS BIGINT)) div 1000L").alias("x"))
        .orderBy("t")
        .limit(32)
        .collect()
    )
    xs = [r["x"] for r in daily]

    def tdiv2(v):
        q = abs(v) // 2
        return q if v >= 0 else -q

    levels = []
    cur = xs
    for _ in range(5):
        s = [tdiv2(cur[2 * i] + cur[2 * i + 1]) for i in range(len(cur) // 2)]
        d = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        levels.append(sum(v * v for v in d))
        cur = s
    row = registry.queries()["haar_wavelet_energy"](spark, sf_small).collect()[0]
    assert row["approx_d"] == float(cur[0])
    for lvl in range(1, 6):
        assert row[f"e{lvl}_d"] == float(levels[lvl - 1])
