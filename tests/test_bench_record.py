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
    # "ab" is bounded by adjudications-per-round and "query_protocol"
    # is fixed-size schema metadata — neither is a growth surface
    slim = json.loads(line)
    slim.pop("ab"), slim.pop("ab_ref"), slim.pop("query_protocol")
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
    assert len(warns) == 1 and "q_slow" in warns[0], r.stdout
    assert "q_adj" not in "".join(warns)
    assert "ab=1.01x" in r.stdout
