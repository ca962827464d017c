"""Bench-record discipline (VERDICT r5 #1/#8): BENCH_r05.json shipped as
parsed:null because the emitted line outgrew the driver's ~2 KB stdout
capture. The record must round-trip and fit the budget even with
worst-case timings, every headline query must exist in the registry, and
the Python-axis set must be a subset of the headline set."""

from __future__ import annotations

import json

import bench
from streaming_ml_with_ksql_spark import registry


def test_headline_queries_are_registered():
    qs = registry.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"headline queries not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_axes_are_headline_subsets_and_disjoint():
    for axis in (bench.PY_AXIS, bench.CODEC_AXIS, bench.SHUFFLE_AXIS):
        extra = axis - set(bench.HEADLINE)
        assert not extra, f"axis entries not in HEADLINE: {extra}"
    assert not bench.PY_AXIS & bench.CODEC_AXIS
    assert not bench.PY_AXIS & bench.SHUFFLE_AXIS
    assert not bench.CODEC_AXIS & bench.SHUFFLE_AXIS


def test_record_fits_capture_budget_at_worst_case():
    """Even pathological timings (4-digit seconds everywhere, slow
    calibrations) must produce a parseable line under the capture
    budget — the regression that broke r5's record was size, and size
    grows with value width and query count. VERDICT r7 #8: keep >=15%
    headroom so the headline can still grow a few entries."""
    timings = {n: 9999.99 for n in bench.HEADLINE}
    # worst-case spread block too: every pair maximally divergent (the
    # emitter caps the shipped block at the 6 worst)
    spread = {n: [999.99, 9999.99] for n in bench.HEADLINE}
    line = bench.build_line(
        timings, 0.1, 99.999, 99.999, 99.999, 99.999, spread=spread
    )
    # hard cap includes the fixed-size "ab" adjudication block (r12)
    assert len(line.encode()) <= bench.LINE_BUDGET_BYTES
    # the 15% growth headroom is measured on the timing-dependent part:
    # "ab" is bounded by adjudications-per-round, "query_protocol" is
    # fixed-size schema metadata, and "spread" is capped at 6 entries —
    # none is a growth surface
    slim = json.loads(line)
    assert len(slim.get("spread", {})) <= 6
    for k in ("ab", "ab_ref", "query_protocol", "spread"):
        slim.pop(k, None)
    assert (
        len(json.dumps(slim, separators=(",", ":")).encode())
        <= bench.LINE_BUDGET_BYTES * 0.85
    )
    parsed = json.loads(line)
    assert parsed["queries"] and parsed["calib_protocol"] == bench.CALIB_PROTOCOL
    assert parsed["value_norm_jvm"] > 0 and parsed["value_norm_py"] > 0
    assert parsed["value_norm_codec"] > 0 and parsed["value_norm_shuffle"] > 0


def test_per_axis_normalization_uses_each_axis():
    """A slowdown on one calibration axis must scale ONLY that axis's
    total (ADVICE r5: the r5 record scaled Python-kernel queries by the
    JVM axis; r8 adds the codec axis)."""
    timings = {n: 1.0 for n in bench.HEADLINE}
    refs = (
        bench.CALIB_REF,
        bench.CALIB_PY_REF,
        bench.CALIB_CODEC_REF,
        bench.CALIB_SHUFFLE_REF,
    )
    keys = (
        "value_norm_jvm",
        "value_norm_py",
        "value_norm_codec",
        "value_norm_shuffle",
    )
    base = json.loads(bench.build_line(timings, 0.1, *refs))
    for i, key in enumerate(keys):
        calibs = list(refs)
        calibs[i] *= 2
        slow = json.loads(bench.build_line(timings, 0.1, *calibs))
        assert slow[key] == round(base[key] / 2, 2)
        for other in keys:
            if other != key:
                assert slow[other] == base[other]


def test_bench_compare_warns_on_unadjudicated_regression(tmp_path):
    """VERDICT r11 #8: bench_compare must WARN on any >1.35x normalized
    regression whose name lacks an 'ab' adjudication entry in the new
    record, and stay silent for adjudicated ones."""
    import subprocess
    import sys

    old = {
        "queries": {"q_slow": 1.0, "q_adj": 1.0, "q_flat": 1.0},
        "calib_sec": bench.CALIB_REF,
        "calib_py_sec": bench.CALIB_PY_REF,
        "calib_codec_sec": bench.CALIB_CODEC_REF,
        "calib_protocol": bench.CALIB_PROTOCOL,
    }
    new = dict(old)
    new["queries"] = {"q_slow": 2.0, "q_adj": 2.0, "q_flat": 1.0}
    new["ab"] = {"q_adj": 1.9}
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    r = subprocess.run(
        [sys.executable, "scripts/bench_compare.py", str(a), str(b)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    warns = [ln for ln in r.stdout.splitlines() if ln.startswith("WARNING")]
    assert len(warns) == 1 and "q_slow" in warns[0], r.stdout
    assert "q_adj" not in "".join(warns)
    assert "ab=1.9x" in r.stdout


def test_bench_compare_warns_on_stale_adjudication(tmp_path):
    """ADVICE r12 #3: an 'ab' entry must not permanently mask a NEW
    regression — when the recorded normalized ratio exceeds the
    adjudicated code-ratio by >1.35x, bench_compare flags the entry as
    STALE instead of staying silent."""
    import subprocess
    import sys

    old = {
        "queries": {"q_adj": 1.0},
        "calib_sec": bench.CALIB_REF,
        "calib_py_sec": bench.CALIB_PY_REF,
        "calib_codec_sec": bench.CALIB_CODEC_REF,
        "calib_protocol": bench.CALIB_PROTOCOL,
    }
    new = dict(old)
    # adjudicated at ~1.0x months ago, now reading 2.0x — the shield is
    # stale and must not hold
    new["queries"] = {"q_adj": 2.0}
    new["ab"] = {"q_adj": 1.01}
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    r = subprocess.run(
        [sys.executable, "scripts/bench_compare.py", str(a), str(b)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    warns = [ln for ln in r.stdout.splitlines() if ln.startswith("WARNING")]
    assert len(warns) == 1 and "STALE" in warns[0] and "q_adj" in warns[0]
