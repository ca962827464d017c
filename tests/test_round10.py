"""Round-10 tests: PRF query expansion, sequential patterns, Kendall
tau-b, Brier decomposition, Heaps growth — each oracle-checked, plus
independent third-vote replays and invariants (the r8 lesson:
cross-engine agreement proves consistency, not correctness)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.registry import _REGISTRY
from tests.oracle import assert_query_matches

ROUND10 = [
    "prf_expansion_terms",
    "prf_query_expansion",
    "sequential_pattern_support",
    "kendall_tau_hour_value",
    "brier_score_decomposition",
    "heaps_vocab_growth",
    "stump_cv_events",
    "association_rules_copurchase",
    "retention_cohort_matrix",
    "int8_quantized_topk",
    "event_type_week_pivot",
    "isotonic_recalibration_bins",
    "ece_after_isotonic_recalibration",
    "ridge_two_factor_revenue",
]

ROUND10_STREAMING = [
    "streaming_calibration_ingest",
    "streaming_pivot_ingest",
]


@pytest.mark.parametrize("name", ROUND10)
@pytest.mark.sweep
def test_round10_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize("name", ROUND10_STREAMING)
@pytest.mark.sweep
def test_round10_streaming_matches_oracle(spark, sf_small, name):
    assert_query_matches(spark, name, sf_small)


def test_stump_cv_beats_constant_model_on_train(spark, sf_small):
    """The fitted stump's train MSE can exceed the exact-mean constant
    model's only by the truncated-leaf penalty (< 2*sqrt(MSE0)+1 in
    centi^2 — each leaf's truncated mean is within 1 cent of exact).
    Also pins the output contract: one row per fold, fid in 1..3,
    test set sizes partition the corpus."""
    rows = _REGISTRY["stump_cv_events"].spark(spark, sf_small).collect()
    assert sorted(r.fold_d for r in rows) == [0.0, 1.0, 2.0, 3.0, 4.0]
    ev = io_mod.load_table(spark, sf_small, "events")
    n_all = ev.filter(F.col("value").isNotNull()).count()
    assert sum(r.n_test_d for r in rows) == float(n_all)
    from streaming_ml_with_ksql_spark.operators.text import _hash_bucket

    recs = (
        ev.filter(F.col("value").isNotNull())
        .select(
            _hash_bucket(F.col("event_id"), salt="cv", mod=5).alias(
                "fold"
            ),
            F.expr(
                "CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT)"
            ).alias("y"),
        )
        .collect()
    )
    for r in rows:
        assert r.fid_d in (1.0, 2.0, 3.0)
        train = [x.y for x in recs if x.fold != int(r.fold_d)]
        m = sum(train) / len(train)
        mse0 = sum((y - m) ** 2 for y in train) / len(train)
        assert r.train_mse_centi2_d <= mse0 + 2 * mse0 ** 0.5 + 1


def test_kendall_tau_python_replay(spark, sf_small):
    """Third vote: plain-Python O(n^2) Kendall tau-b over the raw
    (hour, bucket) pairs must equal the cell-histogram computation —
    the histogram contraction is the part both engines share."""
    row = (
        _REGISTRY["kendall_tau_hour_value"].spark(spark, sf_small).collect()
    )[0]
    ev = io_mod.load_table(spark, sf_small, "events")
    pairs = [
        (r.x, r.y)
        for r in ev.filter(F.col("value").isNotNull())
        .select(
            F.hour("ts").cast("long").alias("x"),
            F.least(F.lit(9), F.floor(F.col("value") / 50.0))
            .cast("long")
            .alias("y"),
        )
        .collect()
    ]
    nc = nd = 0
    n = len(pairs)
    for i in range(n):
        xi, yi = pairs[i]
        for j in range(i + 1, n):
            xj, yj = pairs[j]
            if xi == xj or yi == yj:
                continue
            if (xi < xj) == (yi < yj):
                nc += 1
            else:
                nd += 1
    assert row.nc_d == float(nc)
    assert row.nd_d == float(nd)
    n0 = n * (n - 1) // 2
    assert row.n0_d == float(n0)
    assert row.tau_b_d is None or -1.0 <= row.tau_b_d <= 1.0
    if row.tau_b_d is not None:
        import math

        expect = (nc - nd) / math.sqrt(
            (n0 - int(row.n1_d)) * (n0 - int(row.n2_d))
        )
        assert abs(row.tau_b_d - expect) < 1e-12


def test_brier_murphy_identity(spark, sf_small):
    """Third vote, plain-Python floats: with non-constant forecasts per
    bin the generalized Murphy identity is Brier = REL - RES + UNC
    + WBV - 2*WBC (within-bin forecast variance and forecast-outcome
    covariance). Verify the float identity holds exactly, then that the
    operator's integer-ppm REL/RES/UNC/Brier match the float values up
    to division truncation (<= 1 ppm per bin mean -> ~2e6 ppm^2)."""
    row = (
        _REGISTRY["brier_score_decomposition"].spark(spark, sf_small)
    ).collect()[0]
    ev = io_mod.load_table(spark, sf_small, "events")
    recs = (
        ev.filter(F.col("value").isNotNull())
        .select(
            F.least(F.lit(9), F.floor(F.col("value") / 50.0))
            .cast("long")
            .alias("bin"),
            (F.col("event_type") == "purchase").cast("long").alias("o"),
            F.expr(
                "CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT) * 20"
            ).alias("f"),
        )
        .collect()
    )
    n = len(recs)
    obar = sum(r.o for r in recs) / n
    bins: dict[int, list] = {}
    for r in recs:
        bins.setdefault(r.bin, []).append(r)
    brier = sum((r.f - r.o * 1e6) ** 2 for r in recs) / n
    rel = res = wbv = wbc = 0.0
    for rows_k in bins.values():
        nk = len(rows_k)
        fbar = sum(r.f for r in rows_k) / nk
        ok = sum(r.o for r in rows_k) / nk
        rel += nk * (fbar - ok * 1e6) ** 2
        res += nk * ((ok - obar) * 1e6) ** 2
        wbv += sum((r.f - fbar) ** 2 for r in rows_k)
        wbc += sum((r.f - fbar) * (r.o - ok) * 1e6 for r in rows_k)
    rel, res, wbv, wbc = rel / n, res / n, wbv / n, wbc / n
    unc = obar * (1 - obar) * 1e12
    # the float identity itself (sanity of the decomposition algebra)
    assert abs(brier - (rel - res + unc + wbv - 2 * wbc)) < 1e-3 * brier
    # the operator's truncated-integer outputs track the float values
    tol = 2e6
    assert abs(row.brier_ppm2_d - brier) <= tol
    assert abs(row.rel_ppm2_d - rel) <= tol
    assert abs(row.res_ppm2_d - res) <= tol
    assert abs(row.unc_ppm2_d - unc) <= tol
    assert 0 <= row.base_ppm_d <= 1_000_000
    assert row.unc_ppm2_d == row.base_ppm_d * (1_000_000 - row.base_ppm_d)


def test_sequential_pattern_prefix_monotone(spark, sf_small):
    """Containment monotonicity: support(a->b->c) <= support(a->b),
    computed independently by the two-step version of the same greedy
    earliest-occurrence chain."""
    sup3 = {
        (r.step_a, r.step_b, r.step_c): r.support_d
        for r in _REGISTRY["sequential_pattern_support"]
        .spark(spark, sf_small)
        .collect()
    }
    ev = io_mod.load_table(spark, sf_small, "events")
    e = ev.select("user_id", "event_type", "ts").distinct()
    a = e.groupBy("user_id", F.col("event_type").alias("step_a")).agg(
        F.min("ts").alias("t1")
    )
    sup2 = {
        (r.step_a, r.step_b): r.s
        for r in e.join(a, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .select("user_id", "step_a", F.col("event_type").alias("step_b"))
        .distinct()
        .groupBy("step_a", "step_b")
        .agg(F.count(F.lit(1)).alias("s"))
        .collect()
    }
    assert sup3, "no supported triples at sf_small"
    for (sa, sb, _sc), s in sup3.items():
        assert s <= sup2[(sa, sb)]


def test_heaps_growth_monotone_and_final_totals(spark, sf_small):
    """Vocabulary and token counts are non-decreasing in the prefix
    fraction, and the k=16 row equals independently-computed corpus
    totals."""
    rows = sorted(
        _REGISTRY["heaps_vocab_growth"].spark(spark, sf_small).collect(),
        key=lambda r: r.k_frac16_d,
    )
    assert [r.k_frac16_d for r in rows] == [1.0, 2.0, 4.0, 8.0, 16.0]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_tokens_d >= prev.n_tokens_d
        assert cur.vocab_uni_d >= prev.vocab_uni_d
        assert cur.vocab_bi_d >= prev.vocab_bi_d
    docs = io_mod.load_table(spark, sf_small, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    total = docs.select(F.sum(F.size(toks)).alias("s")).collect()[0].s
    vocab = (
        docs.select(F.explode(toks).alias("t")).distinct().count()
    )
    assert rows[-1].n_tokens_d == float(total)
    assert rows[-1].vocab_uni_d == float(vocab)


def test_prf_expansion_contract(spark, sf_small):
    """Expansion terms exclude the seeds, are at most five, and the
    final top-10 docs all carry positive integer micro scores."""
    terms = (
        _REGISTRY["prf_expansion_terms"].spark(spark, sf_small).collect()
    )
    assert 1 <= len(terms) <= 5
    for t in terms:
        assert t.term not in ("stream", "window")
        assert len(t.term) >= 3
        assert t.w_micro_d > 0
    docs = (
        _REGISTRY["prf_query_expansion"].spark(spark, sf_small).collect()
    )
    assert len(docs) == 10
    assert all(d.prf_score_micro_d > 0 for d in docs)
    scores = [d.prf_score_micro_d for d in docs]
    assert all(s == int(s) for s in scores), "scores must be integer micros"


def test_association_rules_consistency(spark, sf_small):
    """Rule arithmetic invariants: sup(abc) <= sup(ab), confidence in
    (0, 1e6], and every rule's antecedent pair really is a frequent
    pair of the independently-verified copurchase stage."""
    rows = (
        _REGISTRY["association_rules_copurchase"]
        .spark(spark, sf_small)
        .collect()
    )
    assert rows, "no rules at sf_small"
    for r in rows:
        assert r.n_abc_d <= r.n_ab_d
        assert 0 < r.conf_ppm_d <= 1_000_000
        assert r.ant_a < r.ant_b
        assert r.cons not in (r.ant_a, r.ant_b)


def test_retention_cohort_triangle(spark, sf_small):
    """Offset-0 cells are the cohorts themselves (retention exactly
    1e6 ppm), activity never exceeds cohort size, and cohort sizes sum
    to the distinct-user count."""
    rows = (
        _REGISTRY["retention_cohort_matrix"].spark(spark, sf_small)
    ).collect()
    zero = [r for r in rows if r.week_offset_d == 0.0]
    assert zero and all(r.retention_ppm_d == 1_000_000 for r in zero)
    assert all(r.n_active_d == r.cohort_size_d for r in zero)
    assert all(
        0 < r.n_active_d <= r.cohort_size_d and r.week_offset_d >= 0
        for r in rows
    )
    ev = io_mod.load_table(spark, sf_small, "events")
    n_users = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.cohort_size_d for r in zero) == float(n_users)


def test_int8_recall_vs_float_bruteforce(spark, sf_small):
    """The int8 de-quantized ranking must stay close to the float
    cosine ordering it approximates: mean top-5 overlap >= 3/5 across
    the 20 probes (the quantization-fidelity bound the binary family
    pins at 1/5 granularity)."""
    from streaming_ml_with_ksql_spark.operators import similarity

    emb = io_mod.load_table(spark, sf_small, "embeddings")
    f = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb)
        .select("query_id", "neighbor_id")
        .collect()
    }
    q = {
        (r.query_id, r.neighbor_id)
        for r in similarity.int8_dot_topk(emb)
        .select("query_id", "neighbor_id")
        .collect()
    }
    n_queries = len({a for a, _ in f})
    overlap = len(f & q) / (5 * n_queries)
    assert overlap >= 0.6, f"int8 top-5 recall {overlap:.2f} < 0.6"


def test_isotonic_recalibration_pava_replay(spark, sf_small):
    """Third vote: a plain-Python minimax PAV over the same integer
    bins must reproduce the fitted values exactly, and the fit must be
    monotone non-decreasing in the bin order (true for the minimax of
    ANY matrix, flooring included)."""
    rows = sorted(
        _REGISTRY["isotonic_recalibration_bins"]
        .spark(spark, sf_small)
        .collect(),
        key=lambda r: r.bin_d,
    )
    ev = io_mod.load_table(spark, sf_small, "events")
    g = {
        int(r.b): (r.n, r.p)
        for r in ev.filter(F.col("value").isNotNull())
        .groupBy(
            F.least(F.lit(9), F.floor(F.col("value") / 50.0))
            .cast("long")
            .alias("b")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("p"),
        )
        .collect()
    }
    bins = sorted(g)

    def pooled(i, j):
        n = sum(g[b][0] for b in bins if i <= b <= j)
        p = sum(g[b][1] for b in bins if i <= b <= j)
        return (p * 1_000_000) // n

    fitted = {
        k: max(
            min(pooled(i, j) for j in bins if j >= k)
            for i in bins
            if i <= k
        )
        for k in bins
    }
    assert [int(r.bin_d) for r in rows] == bins
    for r in rows:
        assert r.fitted_ppm_d == float(fitted[int(r.bin_d)])
    vals = [r.fitted_ppm_d for r in rows]
    assert vals == sorted(vals), "isotonic fit must be monotone"


def test_isotonic_recalibration_improves_ece(spark, sf_small):
    """The monotone fit can only tighten the n-weighted calibration gap
    on mis-calibrated scores; pin ece_after <= ece_before and both
    within [0, 1e6]."""
    row = (
        _REGISTRY["ece_after_isotonic_recalibration"]
        .spark(spark, sf_small)
        .collect()
    )[0]
    assert 0 <= row.ece_after_ppm_d <= row.ece_before_ppm_d <= 1_000_000
    assert row.mce_after_ppm_d <= 1_000_000


def test_ridge_python_replay(spark, sf_small):
    """Third vote: exact Cramer replay in plain-Python ints (no float
    anywhere) must reproduce the ridge coefficients bit-for-bit."""
    row = (
        _REGISTRY["ridge_two_factor_revenue"].spark(spark, sf_small)
    ).collect()[0]
    ev = io_mod.load_table(spark, sf_small, "orders")
    daily = (
        ev.groupBy(
            F.datediff(
                F.date_trunc("day", F.col("o_orderdate")),
                F.lit("1995-01-01").cast("timestamp"),
            ).alias("t"),
            F.expr(
                "CAST((datediff(date_trunc('day', o_orderdate),"
                " DATE '1970-01-01') + 3) % 7 >= 5 AS BIGINT)"
            ).alias("w"),
        )
        .agg(
            F.expr(
                "sum(CAST(floor(o_totalprice * CAST(1000 AS DOUBLE))"
                " AS BIGINT))"
            ).alias("y")
        )
        .collect()
    )
    n = len(daily)
    st = sum(r.t for r in daily)
    sw = sum(r.w for r in daily)
    stt = sum(r.t * r.t for r in daily) + n
    stw = sum(r.t * r.w for r in daily)
    sww = sum(r.w * r.w for r in daily) + n
    sy = sum(r.y for r in daily)
    sty = sum(r.t * r.y for r in daily)
    swy = sum(r.w * r.y for r in daily)
    det = (
        n * (stt * sww - stw * stw)
        - st * (st * sww - stw * sw)
        + sw * (st * stw - stt * sw)
    )
    det0 = (
        sy * (stt * sww - stw * stw)
        - st * (sty * sww - stw * swy)
        + sw * (sty * stw - stt * swy)
    )
    det1 = (
        n * (sty * sww - swy * stw)
        - sy * (st * sww - stw * sw)
        + sw * (st * swy - sty * sw)
    )
    det2 = (
        n * (stt * swy - stw * sty)
        - st * (st * swy - sty * sw)
        + sy * (st * stw - stt * sw)
    )
    assert det > 0

    def trunc(num):
        q = abs(num) * 1000 // det
        return float(q if num >= 0 else -q)

    assert row.n_days_d == float(n)
    assert row.b0_microd_d == trunc(det0)
    assert row.b1_microd_per_day_d == trunc(det1)
    assert row.b2_microd_weekend_d == trunc(det2)


def test_isotonic_fit_monotone_and_mass_conserving(spark, sf_small):
    """Structural PAV invariants independent of the minimax replay:
    (1) the fitted step function is non-decreasing in the bin index,
    (2) it is bracketed by the extreme observed pooled rates, and
    (3) PAV conserves the n-weighted positive mass — each pooled block's
    fit is the block's pooled mean, so with floored-ppm fits the total
    weighted fit can undershoot sum(p)*1e6 by at most sum(n) (one ulp
    of flooring per row) and can never overshoot."""
    rows = sorted(
        _REGISTRY["isotonic_recalibration_bins"]
        .spark(spark, sf_small)
        .collect(),
        key=lambda r: r.bin_d,
    )
    assert len(rows) >= 3
    fits = [r.fitted_ppm_d for r in rows]
    assert fits == sorted(fits), "fitted_ppm must be monotone in bin"
    # recompute exact per-bin positives from raw events (the query only
    # exposes the floored acc ppm)
    ev = io_mod.load_table(spark, sf_small, "events").filter(
        F.col("value").isNotNull()
    )
    g = {
        r.b: (r.n, r.p)
        for r in ev.groupBy(
            F.least(F.lit(9), F.floor(F.col("value") / 50.0))
            .cast("long")
            .alias("b")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("p"),
        )
        .collect()
    }
    total_n = sum(n for n, _ in g.values())
    total_p = sum(p for _, p in g.values())
    lo = min(p * 10**6 // n for n, p in [(g[int(r.bin_d)]) for r in rows])
    hi = max(-((-p * 10**6) // n) for n, p in g.values())
    assert all(lo <= f <= hi for f in fits)
    weighted_fit = sum(
        g[int(r.bin_d)][0] * int(r.fitted_ppm_d) for r in rows
    )
    assert 0 <= total_p * 10**6 - weighted_fit < total_n


def test_sequential_pattern_contained_in_cooccurrence(spark, sf_small):
    """Cross-family containment (VERDICT r10 #5): an ordered witness
    chain a->b->c for a user implies the user has all three event types
    at all, so support(a->b->c) <= |users with {a,b,c} all present| —
    the unordered co-occurrence count, computed here by an independent
    per-user type-set construction (plain Python over collected sets,
    not the greedy min-chain)."""
    sup3 = {
        (r.step_a, r.step_b, r.step_c): r.support_d
        for r in _REGISTRY["sequential_pattern_support"]
        .spark(spark, sf_small)
        .collect()
    }
    assert sup3
    ev = io_mod.load_table(spark, sf_small, "events")
    usersets = {
        r.user_id: set(r.types)
        for r in ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("types"))
        .collect()
    }
    for (a, b, c), s in sup3.items():
        co = sum(
            1 for t in usersets.values() if a in t and b in t and c in t
        )
        assert s <= co, (a, b, c, s, co)


def test_association_rules_cross_stage_supports(spark, sf_small):
    """Third-vote support recomputation (the r8 lesson): every reported
    rule's n_ab and n_abc must equal supports recomputed from raw
    lineitem via plain Python set algebra over order baskets — catching
    any duplicated-key inflation both SQL engines would agree on."""
    rules = (
        _REGISTRY["association_rules_copurchase"]
        .spark(spark, sf_small)
        .collect()
    )
    assert rules
    li = io_mod.load_table(spark, sf_small, "lineitem")
    baskets: dict[int, set[int]] = {}
    for r in (
        li.select("l_orderkey", "l_partkey").distinct().collect()
    ):
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    for r in rules:
        a, b, c = int(r.ant_a), int(r.ant_b), int(r.cons)
        n_ab = sum(1 for s in baskets.values() if a in s and b in s)
        n_abc = sum(
            1 for s in baskets.values() if a in s and b in s and c in s
        )
        assert r.n_ab_d == float(n_ab), (a, b, r.n_ab_d, n_ab)
        assert r.n_abc_d == float(n_abc), (a, b, c, r.n_abc_d, n_abc)


def test_near_dup_kcore_matches_oracle_and_is_nonvacuous(
    spark, sf_medium
):
    """r11 redefinition (VERDICT r10 #7): the k-core now runs on the
    exact ngram-Jaccard near-dup graph so the unrolled-peel CTE oracle
    replays it deterministically. Non-vacuous by construction: the peel
    must REMOVE vertices (core strictly smaller than the graph) and the
    core must be non-empty, else both engines would agree on nothing."""
    assert_query_matches(spark, "near_dup_kcore", sf_medium)
    core = _REGISTRY["near_dup_kcore"].spark(spark, sf_medium).collect()
    assert core, "2-core is empty — degenerate at this SF"
    assert all(r.core_degree_d >= 2 for r in core)
    pairs = _REGISTRY["ngram_jaccard_pairs"].spark(spark, sf_medium)
    verts = (
        pairs.selectExpr("doc_a AS d")
        .unionAll(pairs.selectExpr("doc_b AS d"))
        .distinct()
        .count()
    )
    assert len(core) < verts, "peel removed nothing — vacuous check"
