"""Round-11 wave-3 tests: Mann-Whitney U, skip-gram pairs, Kaplan-Meier
survival, event-type user Jaccard, streaming CUSUM — each oracle-checked
plus an independent third vote (the r8 lesson: cross-engine agreement
proves consistency, not correctness)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.registry import _REGISTRY
from tests.oracle import assert_query_matches

ROUND11B = [
    "mann_whitney_weekend_value",
    "skipgram_training_pairs",
    "kaplan_meier_conversion",
    "event_type_user_jaccard",
    "streaming_cusum_ingest",
    "welch_ttest_weekend_value",
    "logrank_conversion_cohorts",
    "negative_sampling_table",
    "cmh_discount_return_by_weekday",
    "dedup_threshold_sweep",
    "streaming_mann_whitney_ingest",
    "streaming_welch_ingest",
    "wilcoxon_signed_rank_user_value",
    "mcnemar_purchase_weekend",
    "ablation_grid_assignments",
    "kruskal_wallis_value_by_type",
    "friedman_value_by_type",
    "mase_seasonal_naive",
    "brown_forsythe_value_by_type",
    "cronbach_alpha_type_values",
    "streaming_kruskal_ingest",
    "cramers_v_type_weekday",
    "kaplan_meier_greenwood",
]


@pytest.mark.parametrize("name", ROUND11B)
@pytest.mark.sweep
def test_round11b_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


def test_mann_whitney_python_replay(spark, sf_small):
    """Third vote: U, rank-biserial and the tie-corrected z recomputed
    from the raw collected (cell, group) rows with plain-Python average
    ranks. Integer parts must match EXACTLY; the float chain within
    1e-12 relative (the replay multiplies in a different order)."""
    import math

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value") * 10).cast("long").alias("s"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
    ).collect()
    vals = sorted((r.s, r.wk) for r in rows)
    n = len(vals)
    # average ranks over the sorted list
    ranks = {}
    i = 0
    tie3 = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        t = j - i
        ranks[vals[i][0]] = (i + 1 + j) / 2.0  # avg of ranks i+1..j
        tie3 += t * t * t - t
        i = j
    n1 = sum(wk for _, wk in vals)
    n0 = n - n1
    r1 = sum(ranks[s] for s, wk in vals if wk == 1)
    u = r1 - n1 * (n1 + 1) / 2.0
    var_u = n1 * n0 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u - n1 * n0 / 2.0) / math.sqrt(var_u)
    rb = 2.0 * u / (n1 * n0) - 1.0

    got = _REGISTRY["mann_whitney_weekend_value"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_weekend_d == float(n1) and got.n_weekday_d == float(n0)
    assert got.u2_d == 2.0 * u
    assert abs(got.rank_biserial - rb) <= 1e-12 * max(1.0, abs(rb))
    assert abs(got.z_value - z) <= 1e-9 * max(1.0, abs(z))
    assert -1.0 <= got.rank_biserial <= 1.0


def test_skipgram_python_replay(spark, sf_small):
    """Third vote: the full top-100 pair histogram recomputed by a
    plain-Python sliding window over the same whitespace tokenization
    must match the query EXACTLY (set equality including counts) —
    and the pair relation must be symmetric in the full multiset."""
    from collections import Counter

    docs = io_mod.load_table(spark, "/root/testdata/sf0.001", "documents")
    texts = [r.text for r in docs.select("text").collect()]
    c = Counter()
    for tx in texts:
        toks = (tx or "").strip().lower().split()
        # match split(lower(trim), '\s+'): empty text -> ['']
        if tx is None or tx.strip() == "":
            toks = [""]
        for i, w in enumerate(toks):
            for o in (-2, -1, 1, 2):
                j = i + o
                if 0 <= j < len(toks):
                    c[(w, toks[j])] += 1
    # symmetric multiset
    for (a, b), v in c.items():
        assert c[(b, a)] == v
    want = sorted(
        ((-v, a, b) for (a, b), v in c.items())
    )[:100]
    want = {(a, b, float(-nv)) for nv, a, b in want}

    got = {
        (r.center, r.context, r.n_d)
        for r in _REGISTRY["skipgram_training_pairs"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want


def test_kaplan_meier_python_replay(spark, sf_small):
    """Third vote: KM curve replayed sequentially in plain Python from
    the collected (dur, n_risk, d) table — survival must be the
    left-to-right running product (exact float equality: same ops,
    same order), monotone nonincreasing, 1.0 before the first event,
    and the at-risk counts must telescope: n_risk(next) =
    n_risk(cur) - n_total(cur)."""
    rows = sorted(
        _REGISTRY["kaplan_meier_conversion"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.dur_d,
    )
    assert len(rows) >= 5
    s = 1.0
    prev = None
    for r in rows:
        s = s * ((r.n_risk_d - r.d_conv_d) / r.n_risk_d)
        assert r.survival == s, (r.dur_d, r.survival, s)
        if prev is not None:
            assert r.survival <= prev.survival + 1e-15
            assert r.n_risk_d == prev.n_risk_d - (
                prev.d_conv_d + prev.c_cens_d
            )
        prev = r
    assert rows[0].n_risk_d == sum(r.d_conv_d + r.c_cens_d for r in rows)
    assert any(r.c_cens_d > 0 for r in rows) or rows[-1].dur_d == 72.0


def test_event_type_jaccard_python_replay(spark, sf_small):
    """Third vote: Jaccard ppm recomputed from raw distinct user sets
    in plain Python set algebra — exact equality on all 10 pairs."""
    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    pairs = ev.select("event_type", "user_id").distinct().collect()
    sets: dict[str, set] = {}
    for r in pairs:
        sets.setdefault(r.event_type, set()).add(r.user_id)
    got = _REGISTRY["event_type_user_jaccard"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    types = sorted(sets)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for r in got:
        a, b = sets[r.type_a], sets[r.type_b]
        inter = len(a & b)
        assert r.type_a < r.type_b
        assert (r.n_a_d, r.n_b_d, r.n_inter_d) == (
            float(len(a)), float(len(b)), float(inter)
        )
        assert r.jaccard_ppm_d == float(inter * 1000000 // len(a | b))


def test_streaming_cusum_matches_batch(spark, sf_small):
    """The drained streaming CUSUM must equal the same closed-form
    computed directly over the batch daily aggregate (complete-mode
    sums are replay-order invariant)."""
    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    daily = {
        r.day: int(r.cents)
        for r in ev.filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.expr("sum(CAST(floor(value * 100) AS BIGINT))").alias("cents"))
        .collect()
    }
    rows = sorted(
        _REGISTRY["streaming_cusum_ingest"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.day,
    )
    assert {r.day for r in rows} == set(daily)
    target = sum(daily.values()) // len(daily)
    s = 0
    for r in rows:
        assert int(r.cents_d) == daily[r.day]
        s = max(0, s + daily[r.day] - target)
        assert float(s) == r.cusum_cents_d


def test_welch_python_replay(spark, sf_small):
    """Third vote: Welch t and Satterthwaite df recomputed from raw
    cents with plain-Python float moments (different op order) must
    land within 1e-9 relative; integer group counts exact."""
    import math

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.filter(F.col("value").isNotNull()).select(
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
    ).collect()
    g1 = [r.v for r in rows if r.wk == 1]
    g0 = [r.v for r in rows if r.wk == 0]
    n1, n0 = len(g1), len(g0)
    m1, m0 = sum(g1) / n1, sum(g0) / n0
    s21 = (sum(v * v for v in g1) - sum(g1) ** 2 / n1) / (n1 - 1)
    s20 = (sum(v * v for v in g0) - sum(g0) ** 2 / n0) / (n0 - 1)
    se2 = s21 / n1 + s20 / n0
    t = (m1 - m0) / math.sqrt(se2)
    df = se2 * se2 / (
        (s21 / n1) ** 2 / (n1 - 1) + (s20 / n0) ** 2 / (n0 - 1)
    )
    got = _REGISTRY["welch_ttest_weekend_value"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert (got.n_weekend_d, got.n_weekday_d) == (float(n1), float(n0))
    assert abs(got.mean_diff_cents - (m1 - m0)) <= 1e-9 * max(
        1.0, abs(m1 - m0)
    )
    assert abs(got.t_welch - t) <= 1e-9 * max(1.0, abs(t))
    assert abs(got.df_welch - df) <= 1e-9 * df
    assert df > 1.0


def test_logrank_python_replay(spark, sf_small):
    """Third vote: O1/E1/V recomputed sequentially in plain Python from
    an independently-derived (dur, group, event) labeling — exact
    integer O1, floats within 1e-12 relative."""
    import math
    from collections import defaultdict

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    raw = ev.select("user_id", "ts", "event_id", "event_type").collect()
    by_user = defaultdict(list)
    for r in raw:
        by_user[r.user_id].append(r)
    labs = []
    for uid, rs in by_user.items():
        first = min(rs, key=lambda r: (r.ts, r.event_id))
        g = 1 if first.event_type == "signup" else 0
        t0 = min(r.ts for r in rs)
        buys = [r.ts for r in rs if r.event_type == "purchase"]
        t0h = t0.replace(minute=0, second=0, microsecond=0)
        if buys:
            tbh = min(buys).replace(minute=0, second=0, microsecond=0)
            dh = int((tbh - t0h).total_seconds()) // 3600
        else:
            dh = None
        if dh is not None and dh <= 72:
            labs.append((dh, g, 1))
        else:
            labs.append((72, g, 0))
    # cells
    durs = sorted({d for d, _, _ in labs})
    o1 = e1 = v = 0.0
    for t in durs:
        nk = sum(1 for d, _, _ in labs if d >= t)
        n1k = sum(1 for d, g, _ in labs if d >= t and g == 1)
        dk = sum(e for d, _, e in labs if d == t)
        d1k = sum(e for d, g, e in labs if d == t and g == 1)
        if dk == 0:
            continue
        o1 += d1k
        e1 += dk * n1k / nk
        if nk > 1:
            v += dk * (n1k / nk) * (1 - n1k / nk) * (nk - dk) / (nk - 1)
    z = (o1 - e1) / math.sqrt(v)
    got = _REGISTRY["logrank_conversion_cohorts"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.o1_d == o1
    assert abs(got.e1 - e1) <= 1e-12 * max(1.0, abs(e1))
    assert abs(got.v - v) <= 1e-12 * max(1.0, abs(v))
    assert abs(got.z_value - z) <= 1e-9 * max(1.0, abs(z))


def test_negative_sampling_python_replay(spark, sf_small):
    """Third vote: the whole table recomputed in plain Python — the
    nested-sqrt 3/4 power must equal Python's pow EXACTLY on these
    counts, the top-1000 selection must match, and flooring loss is
    bounded by the vocabulary size."""
    import math
    from collections import Counter

    docs = io_mod.load_table(spark, "/root/testdata/sf0.001", "documents")
    c = Counter()
    for r in docs.select("text").collect():
        toks = (r.text or "").strip().lower().split() or [""]
        c.update(toks)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    wsum = 0.0
    for word, _n in sorted(top):
        wsum += math.sqrt(c[word] * math.sqrt(c[word]))
    got = _REGISTRY["negative_sampling_table"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert {r.word for r in got} == {w for w, _ in top}
    total_alloc = 0
    for r in got:
        n = c[r.word]
        w34 = math.sqrt(n * math.sqrt(n))
        assert r.w34 == w34  # nested sqrt == n^(3/4), bit-exact
        assert r.w34 == n ** 0.75 or abs(r.w34 - n ** 0.75) < 1e-12 * w34
        assert r.alloc_d == float(math.floor(1000000 * w34 / wsum))
        total_alloc += int(r.alloc_d)
    assert 1000000 - len(got) < total_alloc <= 1000000


def test_cmh_python_replay(spark, sf_small):
    """Third vote: CMH chi2 and the MH odds ratio recomputed from the
    raw 2x2xK table in plain Python (different op order) — within 1e-9
    relative; also the no-association sanity bound chi2 >= 0."""
    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "lineitem")
    rows = ev.selectExpr(
        "dayofweek(l_shipdate) - 1 AS k",
        "CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS e",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS o",
    ).collect()
    from collections import defaultdict

    cell = defaultdict(int)
    for r in rows:
        cell[(r.k, r.e, r.o)] += 1
    num = den = orn = ordd = 0.0
    n_rows = 0
    for k in range(7):
        a = cell[(k, 1, 1)]
        b = cell[(k, 1, 0)]
        c = cell[(k, 0, 1)]
        d = cell[(k, 0, 0)]
        n = a + b + c + d
        n_rows += n
        if n <= 1:
            continue
        num += a - (a + b) * (a + c) / n
        den += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        orn += a * d / n
        ordd += b * c / n
    chi2 = num * num / den if den > 0 else None
    ormh = orn / ordd if ordd > 0 else None
    got = _REGISTRY["cmh_discount_return_by_weekday"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_rows_d == float(n_rows)
    assert chi2 is not None and got.chi2_cmh >= 0.0
    assert abs(got.chi2_cmh - chi2) <= 1e-9 * max(1.0, chi2)
    assert abs(got.or_mh - ormh) <= 1e-9 * max(1.0, ormh)


def test_dedup_threshold_sweep_python_replay(spark, sf_small):
    """Third vote: the sweep recomputed from the collected exact pair
    list — exact equality per threshold, plus monotonicity (raising
    the threshold can only shrink both counts)."""
    from streaming_ml_with_ksql_spark.operators import text as text_ops

    docs = io_mod.load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = text_ops.ngram_jaccard_pairs(docs).collect()
    got = _REGISTRY["dedup_threshold_sweep"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    prev_pairs = prev_rm = float("inf")
    for t in (5, 6, 7, 8, 9):
        thr = t / 10.0
        np_ = sum(1 for r in pairs if r.jaccard >= thr)
        nr = len({r.doc_b for r in pairs if r.jaccard >= thr})
        assert got[f"pairs_{t}_d"] == float(np_)
        assert got[f"removed_{t}_d"] == float(nr)
        assert np_ <= prev_pairs and nr <= prev_rm
        prev_pairs, prev_rm = np_, nr
    assert got["pairs_5_d"] > 0, "degenerate sweep (no pairs at 0.5)"


def test_wilcoxon_python_replay(spark, sf_small):
    """Third vote: W+ and z recomputed with plain-Python average ranks
    over the per-user dollar-cell differences — exact integer W2,
    z within 1e-9 relative."""
    import math
    from collections import defaultdict

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    raw = ev.filter(F.col("value").isNotNull()).selectExpr(
        "user_id",
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS wk",
        "CAST(floor(value * 100) AS BIGINT) AS v",
    ).collect()
    acc = defaultdict(lambda: [0, 0, 0, 0])  # ws, wc, ys, yc
    for r in raw:
        a = acc[r.user_id]
        if r.wk == 1:
            a[0] += r.v
            a[1] += 1
        else:
            a[2] += r.v
            a[3] += 1
    items = []
    for ws, wc, ys, yc in acc.values():
        if wc > 0 and yc > 0:
            dppm = (ws * 1000000) // wc - (ys * 1000000) // yc
            if dppm != 0:
                items.append((abs(dppm) // 100000000, dppm > 0))
    cells = defaultdict(lambda: [0, 0])
    for cell, pos in items:
        cells[cell][0] += int(pos)
        cells[cell][1] += 1
    before = {}
    run = 0
    tie3 = 0
    for cell in sorted(cells):
        before[cell] = run
        t = cells[cell][1]
        run += t
        tie3 += t * t * t - t
    n = len(items)
    w2 = sum(
        pc * (2 * before[cell] + tc + 1) for cell, (pc, tc) in cells.items()
    )
    num = w2 / 2.0 - n * (n + 1) / 4.0
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    z = num / math.sqrt(var)
    got = _REGISTRY["wilcoxon_signed_rank_user_value"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_pairs_d == float(n)
    assert got.w2_d == float(w2)
    assert abs(got.z_value - z) <= 1e-9 * max(1.0, abs(z))


def test_mcnemar_python_replay(spark, sf_small):
    """Third vote: the discordant cells and chi2 recomputed from raw
    per-user indicators in plain Python — exact equality."""
    from collections import defaultdict

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    raw = ev.selectExpr(
        "user_id",
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS wk",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur",
    ).collect()
    u = defaultdict(lambda: [0, 0])
    for r in raw:
        if r.pur:
            u[r.user_id][0 if r.wk else 1] = 1
        else:
            u.setdefault(r.user_id, [0, 0])
    b = sum(1 for w, y in u.values() if w and not y)
    c = sum(1 for w, y in u.values() if y and not w)
    got = _REGISTRY["mcnemar_purchase_weekend"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert (got.b_d, got.c_d, got.n_users_d) == (
        float(b), float(c), float(len(u))
    )
    if b + c > 0:
        assert got.chi2_mcnemar == (b - c) ** 2 / (b + c)
    assert got.b_d + got.c_d > 0, "degenerate: no discordant pairs"


def test_ablation_grid_python_replay(spark, sf_small):
    """Third vote: the grid recomputed in plain Python from the
    component frames — doc and char conservation (every doc in exactly
    one bucket), decile sizes within the END-rank tie bound, and exact
    per-bucket equality."""
    from collections import defaultdict

    sf = "/root/testdata/sf0.001"
    docs = {
        r.doc_id: r.n_chars
        for r in io_mod.load_table(spark, sf, "documents")
        .select("doc_id", "n_chars").collect()
    }
    dq = {
        r.doc_id: r.quality_score
        for r in _REGISTRY["doc_quality_score"].spark(spark, sf)
        .select("doc_id", "quality_score").collect()
    }
    comp = {
        r.doc_id: (r.group_id, r.group_size)
        for r in _REGISTRY["dedup_components"].spark(spark, sf)
        .select("doc_id", "group_id", "group_size").collect()
    }
    import math

    base = []
    for d, ch in docs.items():
        qcell = math.floor(dq[d] * 1000)
        if d not in comp or comp[d][1] == 1:
            tier = "unique"
        elif d == comp[d][0]:
            tier = "dup_rep"
        else:
            tier = "dup_member"
        base.append((d, ch, qcell, tier))
    n = len(base)
    cells = defaultdict(int)
    for _, _, q, _ in base:
        cells[q] += 1
    r_end = {}
    run = 0
    for q in sorted(cells):
        run += cells[q]
        r_end[q] = run
    want = defaultdict(lambda: [0, 0])
    for _, ch, q, tier in base:
        decile = (r_end[q] * 10 - 1) // n + 1
        want[(decile, tier)][0] += 1
        want[(decile, tier)][1] += ch
    got = _REGISTRY["ablation_grid_assignments"].spark(spark, sf).collect()
    assert sum(r.n_docs_d for r in got) == float(n)
    assert sum(r.chars_d for r in got) == float(sum(docs.values()))
    for r in got:
        nd, ch = want[(int(r.decile_d), r.tier)]
        assert (r.n_docs_d, r.chars_d) == (float(nd), float(ch))
    assert len(got) == len(want)


def test_kruskal_wallis_python_replay(spark, sf_small):
    """Third vote: H recomputed with plain-Python average ranks over
    the raw (cell, type) rows — within 1e-9 relative; and the k=2
    consistency check: collapsing to (purchase vs rest) must square
    the Mann-Whitney z (KW with k=2 is z^2 up to the same tie
    correction)."""
    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.filter(F.col("value").isNotNull()).filter(
        F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"
        )
    ).selectExpr(
        "CAST(floor(value * 10) AS BIGINT) AS s", "event_type"
    ).collect()
    vals = sorted(r.s for r in rows)
    n = len(vals)
    ranks = {}
    i = 0
    tie3 = 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2.0
        tie3 += (j - i) ** 3 - (j - i)
        i = j
    types = sorted({r.event_type for r in rows})
    h = 0.0
    for ty in types:
        sub = [ranks[r.s] for r in rows if r.event_type == ty]
        h += sum(sub) ** 2 / len(sub)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    corr = 1 - tie3 / (n ** 3 - n)
    got = _REGISTRY["kruskal_wallis_value_by_type"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_d == float(n)
    assert abs(got.h_raw - h) <= 1e-9 * max(1.0, abs(h))
    assert abs(got.h_tiecorr - h / corr) <= 1e-9 * max(1.0, abs(h / corr))
    assert got.h_tiecorr >= 0.0


def test_friedman_python_replay(spark, sf_small):
    """Third vote: Friedman chi2 recomputed with plain-Python per-block
    average ranks over independently-derived per-user type means —
    within 1e-9 relative, exact block count."""
    from collections import Counter, defaultdict

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    raw = ev.filter(F.col("value").isNotNull()).selectExpr(
        "user_id", "event_type",
        "CAST(floor(value * 100) AS BIGINT) AS v",
    ).collect()
    acc = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in raw:
        acc[r.user_id][r.event_type][0] += r.v
        acc[r.user_id][r.event_type][1] += 1
    types = ["click", "view", "purchase", "signup", "error"]
    blocks = []
    for uid, per in acc.items():
        if all(t in per and per[t][1] > 0 for t in types):
            blocks.append(
                [per[t][0] * 1000000 // per[t][1] for t in types]
            )
    n, k = len(blocks), 5
    rsums = [0.0] * k
    tie3 = 0
    for vals in blocks:
        for j, v in enumerate(vals):
            rsums[j] += (
                1
                + sum(1 for x in vals if x < v)
                + 0.5 * (sum(1 for x in vals if x == v) - 1)
            )
        for _, c in Counter(vals).items():
            tie3 += c ** 3 - c
    chi2 = 12 * sum(r * r for r in rsums) / (n * k * (k + 1)) - 3 * n * (
        k + 1
    )
    corr = 1 - tie3 / (n * k * (k * k - 1))
    got = _REGISTRY["friedman_value_by_type"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_blocks_d == float(n)
    assert abs(got.chi2_raw - chi2) <= 1e-9 * max(1.0, abs(chi2))
    want = chi2 / corr if corr > 0 else None
    if want is None:
        assert got.chi2_tiecorr is None
    else:
        assert abs(got.chi2_tiecorr - want) <= 1e-9 * max(1.0, abs(want))


def test_mase_python_replay(spark, sf_small):
    """Third vote: both MAEs and the ratio recomputed from the
    collected daily series in plain Python — exact integer sums,
    ratio within 1e-12."""
    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "orders")
    daily = {
        r.day: int(r.cents)
        for r in ev.groupBy(
            F.date_trunc("day", "o_orderdate").alias("day")
        )
        .agg(
            F.expr(
                "sum(CAST(floor(o_totalprice * 100) AS BIGINT))"
            ).alias("cents")
        )
        .collect()
    }
    import datetime

    def mae(k):
        tot = cnt = 0
        for day, c in daily.items():
            prev = day - datetime.timedelta(days=k)
            if prev in daily:
                tot += abs(c - daily[prev])
                cnt += 1
        return tot, cnt

    sae, sn = mae(7)
    nae, nn = mae(1)
    got = _REGISTRY["mase_seasonal_naive"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert (got.sae_cents_d, got.n_seasonal_d) == (float(sae), float(sn))
    assert (got.nae_cents_d, got.n_naive_d) == (float(nae), float(nn))
    want = (sae / sn) / (nae / nn)
    assert abs(got.mase - want) <= 1e-12 * want


def test_brown_forsythe_python_replay(spark, sf_small):
    """Third vote: the BF statistic recomputed in plain Python from
    raw values with an independently computed exact LOWER MEDIAN of
    the centi-quantized values (a plain sort — no histogram, no
    prefix joins, so it cross-checks the two-level cell-math median) —
    exact integer deviation sums, F within 1e-9 relative."""
    import math
    from collections import defaultdict

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    ).collect()
    per = defaultdict(list)
    for r in rows:
        per[r.event_type].append(math.floor(r.value * 100))

    groups = {}
    for t, cs in per.items():
        m = sorted(cs)[(len(cs) - 1) // 2]
        groups[t] = [abs(c - m) for c in cs]
    n = sum(len(g) for g in groups.values())
    k = len(groups)
    gm = sum(sum(g) for g in groups.values()) / n
    ssb = sum(
        len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values()
    )
    ssw = sum(
        sum(z * z for z in g) - sum(g) ** 2 / len(g)
        for g in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = _REGISTRY["brown_forsythe_value_by_type"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_d == float(n)
    assert abs(got.ssb_d - ssb) <= 1e-6 * max(1.0, ssb)
    assert abs(got.ssw_d - ssw) <= 1e-6 * max(1.0, ssw)
    assert abs(got.f_d - f) <= 1e-9 * max(1.0, f)
    assert got.f_d >= 0.0


def test_cronbach_python_replay(spark, sf_small):
    """Third vote: alpha recomputed in plain Python from the same
    complete-block means — within 1e-9 relative; and the split-half
    sanity bound alpha <= 1."""
    from collections import defaultdict

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    raw = ev.filter(F.col("value").isNotNull()).selectExpr(
        "user_id", "event_type",
        "CAST(floor(value * 100) AS BIGINT) AS v",
    ).collect()
    acc = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in raw:
        acc[r.user_id][r.event_type][0] += r.v
        acc[r.user_id][r.event_type][1] += 1
    types = ["click", "view", "purchase", "signup", "error"]
    blocks = []
    for uid, per in acc.items():
        if all(t in per and per[t][1] > 0 for t in types):
            blocks.append(
                [per[t][0] * 1000000 // per[t][1] for t in types]
            )
    n, k = len(blocks), 5

    def var(xs):
        return (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)

    item_vars = sum(var([b[j] for b in blocks]) for j in range(k))
    tot = var([sum(b) for b in blocks])
    alpha = k / (k - 1) * (1 - item_vars / tot)
    got = _REGISTRY["cronbach_alpha_type_values"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_blocks_d == float(n)
    assert abs(got.cronbach_alpha - alpha) <= 1e-9 * max(1.0, abs(alpha))
    assert got.cronbach_alpha <= 1.0


def test_cramers_v_python_replay(spark, sf_small):
    """Third vote: V recomputed from raw contingency counts in plain
    Python — within 1e-9 relative; bounds 0 <= V <= 1."""
    from collections import Counter

    ev = io_mod.load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.selectExpr(
        "event_type",
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS wk",
    ).collect()
    cells = Counter((r.event_type, r.wk) for r in rows)
    n = len(rows)
    rmarg = Counter()
    cmarg = Counter()
    for (t, w), o in cells.items():
        rmarg[t] += o
        cmarg[w] += o
    chi2 = sum(
        (o - rmarg[t] * cmarg[w] / n) ** 2 / (rmarg[t] * cmarg[w] / n)
        for (t, w), o in cells.items()
    )
    import math

    v = math.sqrt(chi2 / (n * min(len(rmarg) - 1, len(cmarg) - 1)))
    got = _REGISTRY["cramers_v_type_weekday"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got.n_d == float(n)
    assert abs(got.cramers_v - v) <= 1e-9 * max(1.0, v)
    assert 0.0 <= got.cramers_v <= 1.0


def test_km_greenwood_python_replay(spark, sf_small):
    """Third vote: Greenwood SEs replayed sequentially in plain Python
    (running product and running sum, exact float equality — same ops
    in the same order), CI bounds clipped and ordered, SE zero before
    the first event."""
    import math

    rows = sorted(
        _REGISTRY["kaplan_meier_greenwood"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.dur_d,
    )
    assert len(rows) >= 5
    s = 1.0
    gw = 0.0
    for r in rows:
        s = s * ((r.n_risk_d - r.d_conv_d) / r.n_risk_d)
        if r.n_risk_d > r.d_conv_d:
            gw = gw + r.d_conv_d / (
                r.n_risk_d * (r.n_risk_d - r.d_conv_d)
            )
        assert r.survival == s
        assert r.se_greenwood == s * math.sqrt(gw)
        assert 0.0 <= r.ci_lo <= r.survival <= r.ci_hi <= 1.0
    assert rows[-1].se_greenwood >= 0.0


def test_tie3_decimal_cast_before_multiply_no_overflow(spark):
    """ADVICE r11 regression: the tie-correction Sum(t^3 - t) must cast
    the FIRST factor to DECIMAL(38,0) BEFORE multiplying — the old
    form cubed in BIGINT and overflowed (both engines) at tc > ~2.09M.
    Proves: (a) the new shared expression survives tc = 3M on BOTH
    engines with the exact same value; (b) the old form really does
    overflow in DuckDB, so the regression cannot silently return."""
    import duckdb

    expr = "CAST(tc AS DECIMAL(38,0)) * tc * tc - tc AS tie3"
    got_s = (
        spark.createDataFrame([(3_000_000,)], "tc long")
        .selectExpr(expr)
        .collect()[0][0]
    )
    want = 3_000_000 ** 3 - 3_000_000
    assert int(got_s) == want
    con = duckdb.connect()
    got_d = con.execute(
        f"SELECT {expr} FROM (VALUES (CAST(3000000 AS BIGINT))) t(tc)"
    ).fetchone()[0]
    assert int(got_d) == want
    with pytest.raises(Exception, match="Overflow"):
        con.execute(
            "SELECT CAST(tc * tc * tc - tc AS DECIMAL(38,0))"
            " FROM (VALUES (CAST(3000000 AS BIGINT))) t(tc)"
        ).fetchone()


def test_event_type_literal_set_covers_data(spark):
    """ADVICE r11: the five-literal event-type set hard-coded into the
    unrolled stats chains (KW/ANOVA/Friedman/Cronbach/BF) must cover
    every distinct event_type in the testdata — a sixth type would
    silently skew any unfiltered base scan. KW now filters its scan to
    the literals on both engines; this pins the data assumption for
    the rest of the family."""
    from streaming_ml_with_ksql_spark.registry.q18_round11b import _KW_TYPES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = io_mod.load_table(spark, sf, "events")
        distinct = {
            r.event_type
            for r in ev.select("event_type").distinct().collect()
        }
        assert distinct <= set(_KW_TYPES), distinct - set(_KW_TYPES)
