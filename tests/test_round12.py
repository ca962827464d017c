"""Round-12 tests: the three rows-only -> exact-oracle conversions
(VERDICT r11 #4/#6) — BPE merge-sequence unrolled argmax, the two-level
HLL partial merge on the register-exact idiom, and the fixed-point
matrix-squaring PCA projection — each oracle-checked at sf0.01 plus the
independent third votes that live next to their operators
(tests/test_bpe.py sequence pin, test_relational.py DataSketches twin,
test_similarity.py numpy-direction closeness)."""

from __future__ import annotations

import pytest

from streaming_ml_with_ksql_spark.registry import _REGISTRY
from tests.oracle import assert_query_matches

ROUND12_LIFTED = [
    "bpe_train_merges",
    "hll_partition_merge",
    "embedding_pca_project",
    "embedding_topk_lsh",
]


@pytest.mark.parametrize("name", ROUND12_LIFTED)
@pytest.mark.sweep
def test_round12_lifted_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


# The queries that remain rows-only BY DESIGN (each with a documented
# reason and a self-check test). Asserted as a NAME set, not a count
# (ADVICE r12 #4): a new legitimately rows-only registration belongs
# here with its reason, and an accidental oracle regression names the
# offending query at the failure site.
ROWS_ONLY_BY_DESIGN = {
    "multimodal_decode",  # binary codec outputs; per-codec twins oracled
    "ksql_runbook_predictions",  # model scores; frozen-prediction self-check
    "streaming_ivf_ingest",  # float-KMeans index maintenance; recall test
}


def test_lifted_queries_are_no_longer_rows_only():
    """Every rows-only registration is one of the documented-by-design
    set (r12 lifted 4, r13 lifted the IVF/PQ/IVF-PQ trio and retired
    approx_sketches), and no query regressed to rows-only."""
    rows_only = {n for n, q in _REGISTRY.items() if q.oracle is None}
    assert not rows_only & set(ROUND12_LIFTED)
    assert rows_only == ROWS_ONLY_BY_DESIGN, sorted(
        rows_only ^ ROWS_ONLY_BY_DESIGN
    )


def test_bpe_train_merges_full_16_rounds(spark, sf_medium):
    """The sf0.01 corpus must exercise all 16 merge rounds (no early
    stop — an early-stopped run would vacuously match a truncated
    oracle), with every merge's parts previously-produced symbols or
    single characters, and ranks dense from 0."""
    out = (
        _REGISTRY["bpe_train_merges"]
        .spark(spark, sf_medium)
        .collect()
    )
    assert len(out) == 16
    ranks = sorted(r.merge_rank for r in out)
    assert ranks == list(range(16))
    known = {r.merged for r in out}
    for r in sorted(out, key=lambda r: r.merge_rank):
        assert r.merged == r.a + r.b
        for part in (r.a, r.b):
            assert len(part) == 1 or part in known, (r.merge_rank, part)


def test_coverage_ledger_not_stale():
    """VERDICT r11 #3: SURVEY §9 must equal what coverage_ledger.py
    computes from the live registry + the CORRECTNESS_r*.json union —
    the r11 ledger went stale (said 267/111 when reality was 312/70)
    because regeneration happened only at session close. --check exits
    non-zero on any drift, including the header counts."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/coverage_ledger.py", "--check"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_hll_alpha_constant_pinned_across_modules():
    """q07 restates q17's alpha*m^2 centi-literal (a module-level import
    would reorder registration) — this pin is what keeps the two HLL
    families on one estimator scale if either is ever recalibrated
    (r12 review finding)."""
    from streaming_ml_with_ksql_spark.registry import q07_layoutcorpus, q17_round11

    assert (
        q07_layoutcorpus._HLL_ALPHA_M2_C == q17_round11._HLL_ALPHA_M2_C
    )


def test_bench_compare_warning_ignores_display_threshold(tmp_path):
    """The 1.35x adjudication guard must fire even when the caller
    passes a LOOSER display threshold (r12 review finding: the guard
    formerly scanned the threshold-filtered list)."""
    import json as _json
    import subprocess
    import sys

    import bench

    old = {
        "queries": {"q_slow": 1.0},
        "calib_sec": bench.CALIB_REF,
        "calib_py_sec": bench.CALIB_PY_REF,
        "calib_codec_sec": bench.CALIB_CODEC_REF,
        "calib_protocol": bench.CALIB_PROTOCOL,
    }
    new = dict(old, queries={"q_slow": 1.4})
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(_json.dumps(old))
    b.write_text(_json.dumps(new))
    r = subprocess.run(
        [sys.executable, "scripts/bench_compare.py", str(a), str(b), "2.0"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert "WARNING" in r.stdout and "q_slow" in r.stdout, r.stdout
