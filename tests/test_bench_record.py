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


def test_py_axis_is_a_headline_subset():
    extra = bench.PY_AXIS - set(bench.HEADLINE)
    assert not extra, f"PY_AXIS entries not in HEADLINE: {extra}"


def test_record_fits_capture_budget_at_worst_case():
    """Even pathological timings (4-digit seconds everywhere, slow
    calibrations) must produce a parseable line under the capture
    budget — the regression that broke r5's record was size, and size
    grows with value width and query count."""
    timings = {n: 9999.99 for n in bench.HEADLINE}
    line = bench.build_line(timings, 0.1, 99.999, 99.999)
    assert len(line.encode()) <= bench.LINE_BUDGET_BYTES
    parsed = json.loads(line)
    assert parsed["queries"] and parsed["calib_protocol"] == bench.CALIB_PROTOCOL
    assert parsed["value_norm_jvm"] > 0 and parsed["value_norm_py"] > 0


def test_per_axis_normalization_uses_each_axis():
    """A JVM-only slowdown must scale only the JVM-axis total; a
    Python-only slowdown only the Python-axis total (ADVICE r5: the r5
    record scaled Python-kernel queries by the JVM axis)."""
    timings = {n: 1.0 for n in bench.HEADLINE}
    base = json.loads(bench.build_line(timings, 0.1, bench.CALIB_REF, bench.CALIB_PY_REF))
    jvm_slow = json.loads(
        bench.build_line(timings, 0.1, 2 * bench.CALIB_REF, bench.CALIB_PY_REF)
    )
    py_slow = json.loads(
        bench.build_line(timings, 0.1, bench.CALIB_REF, 2 * bench.CALIB_PY_REF)
    )
    assert jvm_slow["value_norm_jvm"] == round(base["value_norm_jvm"] / 2, 2)
    assert jvm_slow["value_norm_py"] == base["value_norm_py"]
    assert py_slow["value_norm_py"] == round(base["value_norm_py"] / 2, 2)
    assert py_slow["value_norm_jvm"] == base["value_norm_jvm"]
