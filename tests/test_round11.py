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
    "anova_value_by_type",
    "gains_decile_lift",
    "hll_merge_registers_exact",
]


@pytest.mark.parametrize("name", ROUND11)
@pytest.mark.sweep
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


def test_anova_python_replay(spark, sf_small):
    """Third vote: F recomputed from raw collected (type, cents) pairs
    with numpy-free plain-Python sums in the same fixed type order; the
    double chain is deterministic, so equality is exact (same ops, same
    order, same operands)."""
    row = (
        _REGISTRY["anova_value_by_type"].spark(spark, sf_small).collect()
    )[0]
    import math

    ev = (
        io_mod.load_table(spark, sf_small, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.expr("CAST(floor(value*100) AS BIGINT)").alias("y"))
        .collect()
    )
    types = ["click", "view", "purchase", "signup", "error"]
    n = {t: 0 for t in types}
    s = {t: 0 for t in types}
    q = {t: 0 for t in types}
    for e in ev:
        n[e.event_type] += 1
        s[e.event_type] += e.y
        q[e.event_type] += e.y * e.y
    nn = 0.0
    for t in types:
        nn = nn + float(n[t])
    sm = 0.0
    for t in types:
        sm = sm + float(s[t])
    gm = sm / nn
    ssb = 0.0
    ssw = 0.0
    for t in types:
        if n[t] == 0:
            continue
        mt = float(s[t]) / float(n[t])
        ssb = ssb + float(n[t]) * (mt - gm) * (mt - gm)
        ssw = ssw + (float(q[t]) - float(s[t]) * float(s[t]) / float(n[t]))
    assert row.n_d == nn
    # the replay folds left-to-right like the generated chain; require
    # bit-level closeness (same formula, benign association differences
    # would show far above this)
    assert math.isclose(row.ssb_d, ssb, rel_tol=1e-12)
    assert math.isclose(row.ssw_d, ssw, rel_tol=1e-12)
    f = (ssb / 4.0) / (ssw / (nn - 5.0))
    assert math.isclose(row.f_d, f, rel_tol=1e-12)
    assert row.f_d > 0


def test_gains_table_python_replay(spark, sf_small):
    """Third vote: the decile table recomputed by literally sorting the
    collected (value-cents, is-purchase) rows descending with ties kept
    together (stable cell grouping) and cutting at exact end ranks."""
    rows = sorted(
        _REGISTRY["gains_decile_lift"].spark(spark, sf_small).collect(),
        key=lambda r: r.decile_d,
    )
    assert [r.decile_d for r in rows] == [float(i) for i in range(1, 11)]
    last = rows[-1]
    assert last.capture_ppm_d == 1_000_000 and last.volume_ppm_d == 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert b.cum_n_d > a.cum_n_d and b.cum_pos_d >= a.cum_pos_d
    ev = (
        io_mod.load_table(spark, sf_small, "events")
        .filter(F.col("value").isNotNull())
        .selectExpr(
            "CAST(floor(value*100) AS BIGINT) AS v",
            "CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS pos",
        )
        .collect()
    )
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for e in ev:
        cells[e.v][0] += 1
        cells[e.v][1] += e.pos
    nn = sum(c[0] for c in cells.values())
    pp = sum(c[1] for c in cells.values())
    dec = defaultdict(lambda: [0, 0])
    end_rank = 0
    for v in sorted(cells, reverse=True):
        end_rank += cells[v][0]
        d = (end_rank - 1) * 10 // nn + 1
        dec[d][0] += cells[v][0]
        dec[d][1] += cells[v][1]
    cum_n = cum_p = 0
    want = {}
    for d in sorted(dec):
        cum_n += dec[d][0]
        cum_p += dec[d][1]
        want[float(d)] = (float(cum_n), float(cum_p))
    got = {r.decile_d: (r.cum_n_d, r.cum_pos_d) for r in rows}
    assert got == want
    assert pp > 0 and rows[0].lift_d is not None


def test_hll_merge_equals_direct_single_pass(spark, sf_small):
    """The merge identity stated in Spark itself (the oracle states the
    other side): max-merging per-day register partials must equal the
    direct single-pass register table bit-for-bit."""
    from pyspark.sql import functions as FF

    from streaming_ml_with_ksql_spark.operators.topk import hll_hash_cols

    merged = {
        (r.event_type, r.bucket): r.register
        for r in _REGISTRY["hll_merge_registers_exact"]
        .spark(spark, sf_small)
        .collect()
    }
    ev = io_mod.load_table(spark, sf_small, "events").filter(
        FF.col("user_id").isNotNull()
    )
    key = FF.concat_ws(
        "|",
        FF.col("user_id").cast("string"),
        FF.date_trunc("day", "ts").cast("date").cast("string"),
    )
    bucket, rho = hll_hash_cols(key)
    direct = {
        (r.event_type, r.bucket): r.register
        for r in ev.select(
            "event_type", bucket.alias("bucket"), rho.alias("rho")
        )
        .groupBy("event_type", "bucket")
        .agg(FF.max("rho").cast("int").alias("register"))
        .collect()
    }
    assert merged == direct
    assert len(merged) > 100
