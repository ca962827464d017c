"""Property tests (hypothesis, pure Python — no Spark) for the round-11
mathematical identities the queries rely on. Non-circular: each test
pits the FORMULA a query implements against the textbook DEFINITION on
random inputs, so a formula misconception fails even when both engines
agree (the r8 grid lesson)."""

from __future__ import annotations

import hashlib
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# CUSUM prefix identity (cusum_daily_revenue)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=200,
    )
)
def test_cusum_closed_form_equals_recursion(xs):
    """S_k = P_k - min(0, min_{j<=k} P_j) == the sequential recursion
    S_k = max(0, S_{k-1} + d_k), for any integer deviations d_k."""
    target = sum(xs) // len(xs)
    s = 0
    pref = 0
    mn = 0
    for x in xs:
        d = x - target
        s = max(0, s + d)
        pref += d
        mn = min(mn, pref)
        assert s == pref - min(0, mn) == pref - mn


# ---------------------------------------------------------------------------
# Minimax characterization == pool-adjacent-violators (isotonic bins)
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=0, max_value=50),
        ).filter(lambda t: t[1] <= t[0]),
        min_size=1,
        max_size=12,
    )
)
def test_minimax_equals_pava_on_random_bins(bins):
    """fitted(k) = max_{i<=k} min_{j>=k} pooled(i..j) (Ayer et al. 1955)
    must equal the sequential pool-adjacent-violators sweep in exact
    Fraction arithmetic, for any (n, p) bin sequence — the identity
    isotonic_recalibration_bins implements with floored-ppm pooling."""
    k = len(bins)
    pooled = {}
    for i in range(k):
        n_acc = 0
        p_acc = 0
        for j in range(i, k):
            n_acc += bins[j][0]
            p_acc += bins[j][1]
            pooled[(i, j)] = Fraction(p_acc, n_acc)
    minimax = [
        max(
            min(pooled[(i, j)] for j in range(kk, k))
            for i in range(kk + 1)
        )
        for kk in range(k)
    ]
    # classic PAVA: blocks of (n, p), merge while decreasing
    blocks: list[list[int]] = []
    for n, p in bins:
        blocks.append([n, p])
        while len(blocks) >= 2 and Fraction(
            blocks[-2][1], blocks[-2][0]
        ) >= Fraction(blocks[-1][1], blocks[-1][0]):
            n2, p2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
    # expand blocks back to per-bin fits
    pava = []
    idx = 0
    for n, p in blocks:
        width = 0
        acc = 0
        while acc < n:
            acc += bins[idx][0]
            width += 1
            idx += 1
        pava.extend([Fraction(p, n)] * width)
    assert minimax == pava


# ---------------------------------------------------------------------------
# HLL nibble-arithmetic rho == bit-level leading-zero definition
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_hll_nibble_rho_equals_bit_definition(key):
    """The nibble-walk rho both engines compute (streaming_hll_registers
    / hll_user_days_estimate oracles and topk.hll_hash_cols) must equal
    the textbook definition: 1 + the number of leading zero BITS of the
    120-bit tail that follows the 8-bit bucket prefix of md5(key)."""
    hx = hashlib.md5(key.encode()).hexdigest()
    rest = hx[2:32]  # 30 nibbles = 120 bits
    # nibble walk (the SQL formula)
    stripped = rest.lstrip("0")
    if not stripped:
        rho_nibble = 4 * 30 + 1
    else:
        nz = len(rest) - len(stripped)
        v = int(stripped[0], 16)
        bl = 4 if v >= 8 else 3 if v >= 4 else 2 if v >= 2 else 1
        rho_nibble = 4 * nz + (4 - bl) + 1
    # bit-level definition
    val = int(rest, 16)
    if val == 0:
        rho_bits = 120 + 1
    else:
        rho_bits = (120 - val.bit_length()) + 1
    assert rho_nibble == rho_bits


# ---------------------------------------------------------------------------
# Kappa formula sanity (cohens_kappa_raters)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=2, max_size=300
    )
)
def test_kappa_bounds_symmetry_and_perfect_agreement(pairs):
    """kappa in [-1, 1]; symmetric in the raters; exactly 1 on perfect
    agreement (unless chance agreement is already 1)."""

    def kappa(ps):
        n = len(ps)
        po = Fraction(sum(1 for a, b in ps if a == b), n)
        na1 = sum(1 for a, _ in ps if a)
        nb1 = sum(1 for _, b in ps if b)
        pe = Fraction(na1 * nb1 + (n - na1) * (n - nb1), n * n)
        if pe == 1:
            return None
        return (po - pe) / (1 - pe)

    k = kappa(pairs)
    if k is not None:
        assert -1 <= k <= 1
        k_swapped = kappa([(b, a) for a, b in pairs])
        assert k == k_swapped
    perfect = [(a, a) for a, _ in pairs]
    kp = kappa(perfect)
    assert kp is None or kp == 1
