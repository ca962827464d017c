"""Round-11 tests: CUSUM change detection, Cohen's kappa, n-gram
novelty, blocked edit-distance linkage, exact-integer HLL estimate —
each oracle-checked plus an independent third vote (the r8 lesson:
cross-engine agreement proves consistency, not correctness)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.registry import _REGISTRY
from tests.oracle import assert_query_matches

ROUND11 = [
    "cusum_daily_revenue",
    "cohens_kappa_raters",
    "ngram_novelty_ppm",
    "name_edit_near_dup_pairs",
    "hll_user_days_estimate",
]


@pytest.mark.parametrize("name", ROUND11)
def test_round11_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


def test_cusum_sequential_replay(spark, sf_small):
    """Third vote for the prefix identity: the closed-form
    S_k = P_k - min(0, min_{j<=k} P_j) must equal the literal
    sequential recursion S_k = max(0, S_{k-1} + x_k - target) replayed
    in plain Python over the collected daily series."""
    rows = sorted(
        _REGISTRY["cusum_daily_revenue"].spark(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) > 100
    total = sum(int(r.cents_d) for r in rows)
    target = total // len(rows)
    s = 0
    for r in rows:
        s = max(0, s + int(r.cents_d) - target)
        assert float(s) == r.cusum_cents_d, (r.day, s, r.cusum_cents_d)
    assert any(r.cusum_cents_d > 0 for r in rows), "degenerate series"


def test_kappa_python_replay(spark, sf_small):
    """Kappa recomputed from raw collected labels with exact Fraction
    arithmetic (no ppm flooring) must land within the flooring error of
    the query's integer-ppm version, and the query's kappa is in
    [-1, 1]."""
    from fractions import Fraction

    row = (
        _REGISTRY["cohens_kappa_raters"].spark(spark, sf_small).collect()
    )[0]
    ev = (
        io_mod.load_table(spark, sf_small, "events")
        .filter(F.col("value").isNotNull())
        .select("value", F.hour("ts").alias("h"))
        .collect()
    )
    n = len(ev)
    assert row.n_d == float(n)
    n11 = sum(1 for e in ev if e.value > 250 and e.h >= 12)
    n00 = sum(1 for e in ev if e.value <= 250 and e.h < 12)
    na1 = sum(1 for e in ev if e.value > 250)
    nb1 = sum(1 for e in ev if e.h >= 12)
    po = Fraction(n11 + n00, n)
    pe = Fraction(na1 * nb1 + (n - na1) * (n - nb1), n * n)
    if pe != 1:
        exact_kappa = float((po - pe) / (1 - pe))
        # integer-ppm flooring moves po/pe by < 1e-6 each; the kappa
        # quotient moves by at most ~4e-6 / (1 - pe)
        tol = 8e-6 / float(1 - pe)
        assert abs(row.kappa_d - exact_kappa) <= tol
    assert -1.0 <= row.kappa_d <= 1.0


def test_novelty_conservation_and_bounds(spark, sf_small):
    """Sum of per-doc novel-bigram counts equals the number of df=1
    bigrams in the corpus (each unique bigram belongs to exactly one
    doc), and novelty_ppm is a valid proportion."""
    rows = _REGISTRY["ngram_novelty_ppm"].spark(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.novelty_ppm_d <= 1_000_000
        assert r.n_novel_d <= r.n_bigrams_d
    docs = io_mod.load_table(spark, sf_small, "documents")
    from streaming_ml_with_ksql_spark.operators import text

    toks = text.tokens_col(F.col("text"))
    d = docs.select("doc_id", toks.alias("t")).filter(F.size("t") >= 2)
    df1 = (
        d.select(
            F.explode(
                F.array_distinct(text.shingles(F.col("t"), 2))
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") == 1)
        .count()
    )
    assert sum(int(r.n_novel_d) for r in rows) == df1


def test_name_pairs_python_replay_complete(spark, sf_small):
    """Exhaustive third vote: plain-Python Levenshtein over ALL
    distinct-name pairs (the vocabulary is bounded, so brute force is
    feasible) must reproduce the query's pair set, distances, and
    multiplicities exactly — catching any blocked-join recall loss."""
    rows = {
        (r.name_a, r.name_b): (r.dist_d, r.pair_mult_d)
        for r in _REGISTRY["name_edit_near_dup_pairs"]
        .spark(spark, sf_small)
        .collect()
    }
    assert rows

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    names = {
        r.p_name: r.m
        for r in io_mod.load_table(spark, sf_small, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("m"))
        .collect()
    }
    want = {}
    ns = sorted(names)
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            if a.split(" ")[1] != b.split(" ")[1]:
                continue
            d = lev(a, b)
            if d <= 4:
                want[(a, b)] = (float(d), float(names[a] * names[b]))
    assert rows == want


def test_hll_estimate_within_sketch_error(spark, sf_medium):
    """The raw 256-register estimate must land within a generous 4-sigma
    HLL band (1.04/sqrt(256) ~ 6.5% per sigma) of the exact count it is
    emitted alongside — at sf0.01 the per-type cardinality is far
    outside the small-range bias zone, so the raw estimator applies."""
    rows = (
        _REGISTRY["hll_user_days_estimate"].spark(spark, sf_medium)
    ).collect()
    assert len(rows) >= 2
    for r in rows:
        est = r.est_centi_user_days_d / 100.0
        exact = r.exact_user_days_d
        assert exact > 2.5 * 256, "inside the correction zone — redesign"
        assert abs(est - exact) / exact < 4 * 1.04 / 16.0, (
            r.event_type,
            est,
            exact,
        )
