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
    extra = bench.PY_AXIS - set(bench.HEADLINE)
    assert not extra, f"PY_AXIS entries not in HEADLINE: {extra}"
    extra = bench.CODEC_AXIS - set(bench.HEADLINE)
    assert not extra, f"CODEC_AXIS entries not in HEADLINE: {extra}"
    assert not bench.PY_AXIS & bench.CODEC_AXIS


def test_record_fits_capture_budget_at_worst_case():
    """Even pathological timings (4-digit seconds everywhere, slow
    calibrations) must produce a parseable line under the capture
    budget — the regression that broke r5's record was size, and size
    grows with value width and query count. VERDICT r7 #8: keep >=15%
    headroom so the headline can still grow a few entries."""
    timings = {n: 9999.99 for n in bench.HEADLINE}
    line = bench.build_line(timings, 0.1, 99.999, 99.999, 99.999)
    # hard cap includes the fixed-size "ab" adjudication block (r12)
    assert len(line.encode()) <= bench.LINE_BUDGET_BYTES
    # the 15% growth headroom is measured on the timing-dependent part:
    # "ab" is bounded by adjudications-per-round, not a growth surface
    slim = json.loads(line)
    slim.pop("ab"), slim.pop("ab_ref")
    assert (
        len(json.dumps(slim, separators=(",", ":")).encode())
        <= bench.LINE_BUDGET_BYTES * 0.85
    )
    parsed = json.loads(line)
    assert parsed["queries"] and parsed["calib_protocol"] == bench.CALIB_PROTOCOL
    assert parsed["value_norm_jvm"] > 0 and parsed["value_norm_py"] > 0
    assert parsed["value_norm_codec"] > 0


def test_per_axis_normalization_uses_each_axis():
    """A slowdown on one calibration axis must scale ONLY that axis's
    total (ADVICE r5: the r5 record scaled Python-kernel queries by the
    JVM axis; r8 adds the codec axis)."""
    timings = {n: 1.0 for n in bench.HEADLINE}
    refs = (bench.CALIB_REF, bench.CALIB_PY_REF, bench.CALIB_CODEC_REF)
    base = json.loads(bench.build_line(timings, 0.1, *refs))
    for i, key in enumerate(
        ("value_norm_jvm", "value_norm_py", "value_norm_codec")
    ):
        calibs = list(refs)
        calibs[i] *= 2
        slow = json.loads(bench.build_line(timings, 0.1, *calibs))
        assert slow[key] == round(base[key] / 2, 2)
        for other in ("value_norm_jvm", "value_norm_py", "value_norm_codec"):
            if other != key:
                assert slow[other] == base[other]
