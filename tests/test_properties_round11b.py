"""Property tests (hypothesis, pure Python — no Spark) for the
round-11 wave-3/4 identities. Non-circular: each test pits the FORMULA
a query implements against the textbook DEFINITION on random inputs,
so a formula misconception fails even when both engines agree (the r8
grid lesson)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# Mann-Whitney doubled rank-sum over cells == brute-force pair counting
# (mann_whitney_weekend_value)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),  # cell value
            st.booleans(),  # group 1 membership
        ),
        min_size=2,
        max_size=120,
    )
)
def test_mann_whitney_ranksum_equals_pair_count(obs):
    """U (from the average-rank rank-sum the query computes over the
    cell histogram) must equal the DEFINITION: #(x1 > x0 pairs) + half
    the ties, summed over cross-group pairs. Doubled throughout to stay
    in integers."""
    g1 = [v for v, g in obs if g]
    g0 = [v for v, g in obs if not g]
    if not g1 or not g0:
        return
    # query formula: cells -> before -> ranksum2 -> u2
    from collections import Counter

    cells = Counter(v for v, _ in obs)
    cells1 = Counter(v for v, g in obs if g)
    before = {}
    run = 0
    for s in sorted(cells):
        before[s] = run
        run += cells[s]
    ranksum2 = sum(
        cells1[s] * (2 * before[s] + cells[s] + 1) for s in cells1
    )
    n1 = len(g1)
    u2_formula = ranksum2 - n1 * (n1 + 1)
    # definition: doubled pair count
    u2_def = 0
    for a in g1:
        for b in g0:
            if a > b:
                u2_def += 2
            elif a == b:
                u2_def += 1
    assert u2_formula == u2_def


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-10, max_value=10),
            st.booleans(),
        ),
        min_size=4,
        max_size=80,
    )
)
def test_mann_whitney_z_antisymmetric_under_group_swap(obs):
    """Swapping the group labels must exactly negate z (U1 - n1n0/2 =
    -(U0 - n1n0/2)) and map rank-biserial r -> -r: a sign/orientation
    bug in the query's group indicator would break this."""

    def u2_of(obs, flag):
        g1 = [v for v, g in obs if g is flag]
        g0 = [v for v, g in obs if g is not flag]
        if not g1 or not g0:
            return None, None, None
        u2 = 0
        for a in g1:
            for b in g0:
                u2 += 2 if a > b else (1 if a == b else 0)
        return u2, len(g1), len(g0)

    u2a, n1, n0 = u2_of(obs, True)
    u2b, _, _ = u2_of(obs, False)
    if u2a is None:
        return
    # doubled U's partition all doubled cross pairs
    assert u2a + u2b == 2 * n1 * n0
    # centered statistics negate
    assert (u2a - n1 * n0) == -(u2b - n1 * n0)


# ---------------------------------------------------------------------------
# Kaplan-Meier product fold == telescoped empirical survival when there
# is no censoring (kaplan_meier_conversion)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=200)
)
def test_km_no_censoring_telescopes_to_empirical_survival(durs):
    """With zero censoring, the KM product at time t must equal the
    exact empirical survivor fraction #(dur > t)/N — the product
    telescopes: prod (n_k - d_k)/n_k = n_after/N. Checked in exact
    integers via Fraction."""
    from collections import Counter
    from fractions import Fraction

    n = len(durs)
    cells = Counter(durs)
    at_risk = n
    s = Fraction(1)
    for t in sorted(cells):
        d = cells[t]
        s *= Fraction(at_risk - d, at_risk)
        at_risk -= d
        assert s == Fraction(sum(1 for x in durs if x > t), n)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # duration cell
            st.integers(min_value=0, max_value=5),   # events
            st.integers(min_value=0, max_value=5),   # censored
        ),
        min_size=1,
        max_size=40,
    )
)
def test_km_with_censoring_monotone_and_bounded(cells_in):
    """For ANY event/censor table the KM curve is in [0,1] and
    nonincreasing — and censored exits reduce the at-risk count
    without moving the curve."""
    # aggregate duplicate cells, drop empty ones
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for t, d, c in cells_in:
        agg[t][0] += d
        agg[t][1] += c
    cells = {t: (d, c) for t, (d, c) in agg.items() if d + c > 0}
    if not cells:
        return
    at_risk = sum(d + c for d, c in cells.values())
    s = 1.0
    prev = 1.0
    for t in sorted(cells):
        d, c = cells[t]
        if at_risk > 0 and d > 0:
            s *= (at_risk - d) / at_risk
        assert 0.0 <= s <= prev
        prev = s
        at_risk -= d + c


# ---------------------------------------------------------------------------
# Log-rank O-E terms: A/A null and separation extremes
# (logrank_conversion_cohorts)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # duration
            st.booleans(),                           # event (vs censored)
        ),
        min_size=2,
        max_size=100,
    ),
    st.randoms(use_true_random=False),
)
def test_logrank_group_swap_negates_statistic(labs, rnd):
    """Swapping cohort labels must negate O1 - E1 exactly (in Fraction
    arithmetic) and leave V unchanged — the same hypergeometric table
    viewed from the other margin."""
    from fractions import Fraction

    labeled = [(d, e, rnd.random() < 0.5) for d, e in labs]

    def oe(labeled, flag):
        durs = sorted({d for d, _, _ in labeled})
        o1 = 0
        e1 = Fraction(0)
        v = Fraction(0)
        for t in durs:
            nk = sum(1 for d, _, _ in labeled if d >= t)
            n1k = sum(1 for d, _, g in labeled if d >= t and g is flag)
            dk = sum(1 for d, e, _ in labeled if d == t and e)
            d1k = sum(
                1 for d, e, g in labeled if d == t and e and g is flag
            )
            if dk == 0:
                continue
            o1 += d1k
            e1 += Fraction(dk * n1k, nk)
            if nk > 1:
                v += (
                    Fraction(dk * n1k, nk)
                    * Fraction(nk - n1k, nk)
                    * Fraction(nk - dk, nk - 1)
                )
        return o1, e1, v

    o_a, e_a, v_a = oe(labeled, True)
    o_b, e_b, v_b = oe(labeled, False)
    assert (o_a - e_a) == -(o_b - e_b)
    assert v_a == v_b


# ---------------------------------------------------------------------------
# Skip-gram pair count closed form (skipgram_training_pairs)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from("abcd"), min_size=1, max_size=60))
def test_skipgram_pair_count_closed_form(toks):
    """A window-2 symmetric skip-gram over T tokens must emit exactly
    max(0, 2(T-1)) + max(0, 2(T-2)) directed pairs, and the pair
    multiset must be symmetric."""
    from collections import Counter

    c = Counter()
    for i, w in enumerate(toks):
        for o in (-2, -1, 1, 2):
            j = i + o
            if 0 <= j < len(toks):
                c[(w, toks[j])] += 1
    t = len(toks)
    expect = max(0, 2 * (t - 1)) + max(0, 2 * (t - 2))
    assert sum(c.values()) == expect
    for (a, b), v in c.items():
        assert c[(b, a)] == v


# ---------------------------------------------------------------------------
# Welch statistic invariances (welch_ttest_weekend_value)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=3,
             max_size=60),
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=3,
             max_size=60),
    st.integers(min_value=-500, max_value=500),
)
def test_welch_shift_invariance(g1, g0, shift):
    """Adding the same constant to every observation must leave the
    Welch t and df unchanged (checked in Fraction arithmetic on the
    pre-sqrt quantities, so this is exact)."""
    from fractions import Fraction

    def stats(g1, g0):
        n1, n0 = len(g1), len(g0)
        m1 = Fraction(sum(g1), n1)
        m0 = Fraction(sum(g0), n0)
        s21 = (
            Fraction(sum(v * v for v in g1)) - Fraction(sum(g1) ** 2, n1)
        ) / (n1 - 1)
        s20 = (
            Fraction(sum(v * v for v in g0)) - Fraction(sum(g0) ** 2, n0)
        ) / (n0 - 1)
        se2 = s21 / n1 + s20 / n0
        return m1 - m0, s21, s20, se2

    d_a, s21_a, s20_a, se2_a = stats(g1, g0)
    d_b, s21_b, s20_b, se2_b = stats(
        [v + shift for v in g1], [v + shift for v in g0]
    )
    assert d_a == d_b and s21_a == s21_b and s20_a == s20_b
    assert se2_a == se2_b


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1,
             max_size=100)
)
def test_three_quarter_power_via_nested_sqrt(ns):
    """n^(3/4) == sqrt(n * sqrt(n)) for exact inputs: sqrt is
    correctly rounded, and for the counts the query sees the nested
    form must be monotone and within 1 ulp of pow (the query never
    uses pow — this pins the substitution's accuracy)."""
    prev = 0.0
    for n in sorted(ns):
        w = math.sqrt(n * math.sqrt(n))
        assert w >= prev
        prev = w
        assert abs(w - n ** 0.75) <= 2 * math.ulp(max(w, n ** 0.75))


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank: rank-sum formula == definition (wave 6)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # |d| cell
            st.booleans(),                           # positive sign
        ),
        min_size=1,
        max_size=100,
    )
)
def test_wilcoxon_cell_ranksum_equals_definition(items):
    """W2 from the cell-histogram formula must equal 2x the textbook
    W+ = sum of average ranks of |d| over positive differences."""
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for cell, pos in items:
        cells[cell][0] += int(pos)
        cells[cell][1] += 1
    before = {}
    run = 0
    for cell in sorted(cells):
        before[cell] = run
        run += cells[cell][1]
    w2_formula = sum(
        pc * (2 * before[c] + tc + 1) for c, (pc, tc) in cells.items()
    )
    # definition with average ranks over the sorted |d| list
    svals = sorted(c for c, _ in items)
    # average rank per distinct value
    avg_rank = {}
    i = 0
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        avg_rank[svals[i]] = (i + 1 + j) / 2.0
        i = j
    w_def = sum(avg_rank[c] for c, pos in items if pos)
    assert w2_formula == 2 * w_def


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), st.booleans()),
        min_size=1,
        max_size=100,
    )
)
def test_wilcoxon_sign_flip_reflects_statistic(items):
    """Flipping every sign must map W+ -> n(n+1)/2 - W+ (the positive
    and negative rank sums partition the total rank sum)."""
    from collections import defaultdict

    def w2(items, flip):
        cells = defaultdict(lambda: [0, 0])
        for cell, pos in items:
            cells[cell][0] += int(pos ^ flip)
            cells[cell][1] += 1
        before = {}
        run = 0
        for cell in sorted(cells):
            before[cell] = run
            run += cells[cell][1]
        return sum(
            pc * (2 * before[c] + tc + 1) for c, (pc, tc) in cells.items()
        )

    n = len(items)
    assert w2(items, False) + w2(items, True) == 2 * n * (n + 1) // 2


# ---------------------------------------------------------------------------
# CMH collapses to the plain chi-square when there is ONE stratum
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=500),
    )
)
def test_cmh_single_stratum_equals_pearson_chi2_times_correction(cell):
    """With K=1 the CMH statistic equals (n-1)/n times the Pearson
    chi-square of the 2x2 table — the standard small-sample relation;
    a formula error in num/den breaks this identity."""
    from fractions import Fraction

    a, b, c, d = cell
    n = a + b + c + d
    num = Fraction(a) - Fraction((a + b) * (a + c), n)
    den = Fraction((a + b) * (c + d) * (a + c) * (b + d), n * n * (n - 1))
    cmh = num * num / den if den else None
    # Pearson chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    pearson = Fraction(
        n * (a * d - b * c) ** 2,
        (a + b) * (c + d) * (a + c) * (b + d),
    )
    assert cmh == pearson * Fraction(n - 1, n)


# ---------------------------------------------------------------------------
# McNemar invariances
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=1000),
)
def test_mcnemar_depends_only_on_discordant_cells(a, b, c, d):
    """chi2_mcnemar must be invariant to the concordant cells (a, d)
    and symmetric in (b, c)."""
    if b + c == 0:
        return
    chi = (b - c) ** 2 / (b + c)
    chi_swapped = (c - b) ** 2 / (c + b)
    assert chi == chi_swapped
    assert chi >= 0.0


# ---------------------------------------------------------------------------
# Friedman row-local doubled ranks == sorted average ranks (wave 8)
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=5), min_size=5,
                max_size=5))
def test_friedman_rowlocal_rank_equals_average_rank(vals):
    """The comparison-chain doubled rank 2 + sum(2*[v_i<v_j] +
    [v_i=v_j], i != j) must equal 2x the textbook average rank of v_j
    within the block — and the per-block tie term sum(e_j^2 + 2 e_j)
    must equal sum over tie groups of t^3 - t."""
    from collections import Counter

    svals = sorted(vals)
    for j, v in enumerate(vals):
        r2 = 2 + sum(
            (2 if x < v else (1 if x == v else 0))
            for i, x in enumerate(vals)
            if i != j
        )
        lo = svals.index(v)
        hi = lo + svals.count(v)
        avg_rank = (lo + 1 + hi) / 2.0
        assert r2 == 2 * avg_rank
    tie3_formula = sum(
        (e := sum(1 for i, x in enumerate(vals) if x == v and i != j)) ** 2
        + 2 * e
        for j, v in enumerate(vals)
    )
    tie3_def = sum(c ** 3 - c for c in Counter(vals).values())
    assert tie3_formula == tie3_def
