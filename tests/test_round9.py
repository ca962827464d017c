"""Round-9 tests: deepened GBDT trajectory replay + the invariant-testing
discipline extended to more model-backed families (VERDICT r8 #7/#8 —
cross-engine agreement proves consistency, not correctness; invariants
like monotone MSE, prefix stability, partitioning- and relabeling-
invariance catch the bugs both engines share)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import graph
from streaming_ml_with_ksql_spark.registry import _REGISTRY
from tests.oracle import assert_query_matches

ROUND9 = [
    "gbdt_deep_boost",
    "gbdt_tree2_boost",
    "binary_hamming_topk",
    "binary_vs_float_recall",
    "binary_rerank_pipeline",
    "semantic_decontaminate",
    "ar2_forecast_revenue",
    "mrr_retrieval_eval",
    "column_profile_events",
    "gopher_quality_filter",
    "char_simpson_concentration",
    "contrastive_triplets",
    "textrank_keywords",
    "ece_calibration_error",
    "dedup_span_rewrite",
    "group_aware_split",
    "split_leakage_audit",
    "map_retrieval_eval",
    "incremental_near_dup_ingest",
    "join_cardinality_estimate",
    "canonical_representative_pick",
    "lang_budget_temperature",
    "frequent_triples",
]

ROUND9_STREAMING = [
    "streaming_column_profile",
    "streaming_gopher_filter",
    "streaming_incremental_dedup",
]


@pytest.mark.parametrize("name", ROUND9)
@pytest.mark.sweep
def test_round9_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize("name", ROUND9_STREAMING)
@pytest.mark.sweep
def test_round9_streaming_matches_oracle(spark, sf_small, name):
    assert_query_matches(spark, name, sf_small)


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


def _py_best_split(feats, resid, idxs):
    """SSE-optimal (fid, thr, n_l, s_l, st, n) over the given row subset
    — same grid, gain, and tie-breaks as the engine."""
    best = None
    n = len(idxs)
    st = sum(resid[i] for i in idxs)
    for fid in (1, 2, 3):
        vals = [feats[i][fid - 1] for i in idxs]
        lo, hi = min(vals), max(vals)
        thrs = sorted({lo + ((hi - lo) * j) // 16 for j in range(1, 16)})
        for thr in thrs:
            n_l = sum(1 for v in vals if v <= thr)
            s_l = sum(
                resid[i] for i, v in zip(idxs, vals) if v <= thr
            )
            if n_l == 0 or n_l == n:
                gain = -1.0
            else:
                s_r = st - s_l
                gain = (
                    float(s_l) * float(s_l) / n_l
                    + float(s_r) * float(s_r) / (n - n_l)
                )
            key = (-gain, fid, thr)
            if best is None or key < best[0]:
                best = (key, fid, thr, n_l, s_l)
    _, fid, thr, n_l, s_l = best
    return fid, thr, n_l, s_l, st, n


def test_gbdt_tree2_trajectory_replay(spark, sf_medium):
    """Depth-2 boosted trees: full trajectory (both rounds' root + child
    splits, all eight leaf values, all three MSEs) must match the
    independent Python replay; MSE chain non-increasing; round-1 root
    must equal the stump booster's first stage (identical split search
    on identical residuals)."""
    row = _REGISTRY["gbdt_tree2_boost"].spark(spark, sf_medium).collect()[0]
    mses = [getattr(row, f"mse{i}_centi2_d") for i in range(3)]
    assert mses == sorted(mses, reverse=True)

    shallow = (
        _REGISTRY["gbdt_stump_boost"].spark(spark, sf_medium).collect()[0]
    )
    assert row.t1_root_fid_d == shallow.fid1_d
    assert row.t1_root_thr_d == shallow.thr1_d

    rows = _gbdt_feature_rows(spark, sf_medium)
    feats = [(r.f1, r.f2, r.f3) for r in rows]
    ys = [r.y for r in rows]
    n = len(ys)
    f0 = _trunc_div(sum(ys), n)
    resid = [y - f0 for y in ys]
    assert row.f0_cents_d == float(f0)
    for t in (1, 2):
        all_idx = list(range(n))
        rfid, rthr, *_ = _py_best_split(feats, resid, all_idx)
        assert (
            getattr(row, f"t{t}_root_fid_d"),
            getattr(row, f"t{t}_root_thr_d"),
        ) == (float(rfid), float(rthr))
        leaves = {}
        for side, keep in (
            ("l", lambda v: v <= rthr),
            ("r", lambda v: v > rthr),
        ):
            idxs = [i for i in all_idx if keep(feats[i][rfid - 1])]
            cfid, cthr, n_l, s_l, st, nn = _py_best_split(
                feats, resid, idxs
            )
            lv = _trunc_div(s_l, n_l) if n_l else 0
            rv = _trunc_div(st - s_l, nn - n_l) if nn - n_l else 0
            assert (
                getattr(row, f"t{t}_{side}_fid_d"),
                getattr(row, f"t{t}_{side}_thr_d"),
                getattr(row, f"t{t}_{side}_lv_cents_d"),
                getattr(row, f"t{t}_{side}_rv_cents_d"),
            ) == (float(cfid), float(cthr), float(lv), float(rv))
            leaves[side] = (cfid, cthr, lv, rv)
        new_resid = []
        for i in range(n):
            side = "l" if feats[i][rfid - 1] <= rthr else "r"
            cfid, cthr, lv, rv = leaves[side]
            step = lv if feats[i][cfid - 1] <= cthr else rv
            new_resid.append(resid[i] - step)
        resid = new_resid
        assert getattr(row, f"mse{t}_centi2_d") == float(
            sum(r * r for r in resid) // n
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
        "column_profile_events",
        "textrank_keywords",
        "dedup_span_rewrite",
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


def test_binary_quantize_matches_python_popcount(spark, sf_small):
    """The two 32-bit sign words and the Hamming top-k must match a
    plain-Python bit-twiddling reference on the same vectors."""
    from streaming_ml_with_ksql_spark.operators import similarity

    emb = io_mod.load_table(spark, sf_small, "embeddings")
    vecs = {
        r.vec_id: list(r.embedding)
        for r in emb.select("vec_id", "embedding").collect()
    }

    def code(v):
        lo = sum(1 << i for i in range(32) if v[i] > 0)
        hi = sum(1 << i for i in range(32) if v[32 + i] > 0)
        return lo, hi

    got = {
        r.vec_id: (r.w_lo, r.w_hi)
        for r in similarity.binary_quantize(emb).collect()
    }
    assert got == {k: code(v) for k, v in vecs.items()}

    topk = similarity.binary_hamming_topk(emb, n_queries=5, k=3).collect()
    codes = {k: code(v) for k, v in vecs.items()}
    for q in range(5):
        dists = sorted(
            (
                bin(codes[q][0] ^ c[0]).count("1")
                + bin(codes[q][1] ^ c[1]).count("1"),
                nid,
            )
            for nid, c in codes.items()
            if nid != q
        )[:3]
        got_q = sorted(
            (r.hamming, r.neighbor_id) for r in topk if r.query_id == q
        )
        assert got_q == dists, f"query {q}"


def test_binary_recall_is_meaningful(spark, sf_small):
    """Sign-quantized Hamming must beat chance as a first stage: mean
    recall@5 vs exact cosine strictly above the random-shortlist
    baseline (5/n_corpus ~ 5%), and every per-query recall in [0, 1]."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    rows = _REGISTRY["binary_vs_float_recall"].spark(
        spark, sf_small
    ).collect()
    assert len(rows) == 20
    assert all(0 <= r.n_overlap_d <= 5 for r in rows)
    mean_recall = sum(r.n_overlap_d for r in rows) / (5 * len(rows))
    assert mean_recall > 0.15, mean_recall


def test_semantic_decontaminate_threshold_boundary(spark, sf_small):
    """Every flagged vector's cosine is >= the threshold, no flagged
    vector is itself in the benchmark, and the flag set equals the
    brute-force recomputation."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    rows = _REGISTRY["semantic_decontaminate"].spark(
        spark, sf_small
    ).collect()
    assert all(r.cosine >= 0.4 for r in rows)
    assert all(r.vec_id >= 40 and r.closest_bench_id < 40 for r in rows)


def test_ar2_stationary_sanity(spark, sf_medium):
    """AR(2) on daily revenue: the fit must exist (det > 0 -> non-NULL
    coefficients) and the lag-coefficient magnitudes must be small for
    this near-white daily series (|b1|, |b2| < 0.5 in milli-units x
    1000)."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    row = _REGISTRY["ar2_forecast_revenue"].spark(spark, sf_medium).collect()[
        0
    ]
    assert row.n_days_d > 100
    assert row.b0_millih_d is not None
    assert abs(row.b1_milli_d) < 500 and abs(row.b2_milli_d) < 500


def test_mrr_bounds_and_consistency_with_ndcg(spark, sf_medium):
    """rr_ppm in (0, 1e6]; every anchor appears exactly once; an anchor
    whose NDCG top-5 contains a relevant item must have first_rel_rank
    <= 5 (the two evals rank the same scored list)."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY

    mrr = {
        r.anchor_id: r
        for r in _REGISTRY["mrr_retrieval_eval"]
        .spark(spark, sf_medium)
        .collect()
    }
    assert len(mrr) == 32
    assert all(0 < r.rr_ppm_d <= 1_000_000 for r in mrr.values())
    ndcg = _REGISTRY["ndcg_retrieval_eval"].spark(spark, sf_medium).collect()
    for r in ndcg:
        if r.n_rel_at5_d > 0:
            assert mrr[r.anchor_id].first_rel_rank_d <= 5
        else:
            assert mrr[r.anchor_id].first_rel_rank_d > 5


def test_column_profile_consistency(spark, sf_small):
    """Profile invariants: one row per profiled column; n_null +
    n_distinct-consistent with direct per-column recomputation; the mode
    count never exceeds n_rows - n_null and the mode lies in
    [min_s, max_s] lexicographically."""
    from streaming_ml_with_ksql_spark.registry import _REGISTRY
    from streaming_ml_with_ksql_spark.registry.q15_round9 import (
        _PROFILE_COLS,
    )

    rows = {
        r.col_name: r
        for r in _REGISTRY["column_profile_events"]
        .spark(spark, sf_small)
        .collect()
    }
    assert set(rows) == set(_PROFILE_COLS)
    ev = io_mod.load_table(spark, sf_small, "events")
    n = ev.count()
    et = rows["event_type"]
    assert et.n_rows_d == float(n)
    direct = (
        ev.agg(
            F.count_distinct("event_type").alias("d"),
            F.sum(
                F.when(F.col("event_type").isNull(), 1).otherwise(0)
            ).alias("z"),
        ).collect()[0]
    )
    assert et.n_distinct_d == float(direct.d)
    assert et.n_null_d == float(direct.z)
    for r in rows.values():
        assert r.mode_n_d <= r.n_rows_d - r.n_null_d
        if r.mode_s is not None:
            assert r.min_s <= r.mode_s <= r.max_s


def test_dedup_span_rewrite_planted(spark):
    """Planted-duplicate rewrite: two documents sharing an 8-token span
    lose EXACTLY that span's positions; a document with no shared gram
    is byte-identical after the rewrite (md5 of its own token stream)."""
    import hashlib

    from streaming_ml_with_ksql_spark.operators.text import (
        duplicate_span_positions,
        tokens_col,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight nine"),
            (3, "lone wolf text with nothing shared at all here ok"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_span_positions(docs, k=8, min_docs=2)
    got = {
        (r.doc_id, r.pos) for r in spans.select("doc_id", "pos").collect()
    }
    assert got == {(1, 2), (2, 0)}

    covered = spans.select(
        "doc_id",
        F.explode(F.expr("sequence(CAST(pos AS BIGINT), pos + 7)")).alias(
            "p"
        ),
    ).distinct()
    covlist = covered.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("cov")
    )
    base = docs.select("doc_id", tokens_col(F.col("text")).alias("t"))
    kept_expr = F.filter(
        F.expr(
            "transform(t, (x, i) -> CASE WHEN cov IS NULL"
            " OR NOT array_contains(cov, CAST(i AS BIGINT))"
            " THEN x END)"
        ),
        lambda x: x.isNotNull(),
    )
    out = {
        r.doc_id: r.cleaned
        for r in base.join(covlist, "doc_id", "left")
        .select("doc_id", F.concat_ws(" ", kept_expr).alias("cleaned"))
        .collect()
    }
    assert out[1] == "one two three four"
    assert out[2] == "five six seven eight nine"
    assert out[3] == "lone wolf text with nothing shared at all here ok"
    # and the registered query's md5 convention matches hashlib
    assert (
        hashlib.md5(out[3].encode()).hexdigest()
        == hashlib.md5(b"lone wolf text with nothing shared at all here ok").hexdigest()
    )


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


def test_cms_join_estimate_upper_bounds_exact(spark, sf_small):
    """CMS inner-product join-size estimate must upper-bound the exact
    join size (every cell count upper-bounds its keys' frequency sum, so
    the per-row inner product upper-bounds Σ f_a·f_b; min preserves it)."""
    row = _REGISTRY["join_cardinality_estimate"].spark(
        spark, sf_small
    ).collect()[0]
    assert row.est_rows_d >= row.exact_rows_d > 0
    assert row.est_ratio_ppm_d >= 1_000_000
