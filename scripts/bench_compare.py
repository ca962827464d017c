"""Compare two bench records with per-axis normalization.

Usage: python scripts/bench_compare.py OLD.json NEW.json [threshold]

Loads two BENCH records (either the driver's capture format with a
``tail``/raw line or bench.py's own one-line JSON), normalizes each
query by ITS calibration axis (PY_AXIS queries by calib_py, everything
else by the JVM calib — ADVICE r5: a single axis misattributes host
drift as plan regressions), and prints queries whose normalized ratio
moved beyond the threshold (default 1.3x either way). Queries present
in only one record are listed separately.

This is the builder-side tool for the A/B discipline in
memory/bench-host-drift-axes.md: before treating a ratio as real,
confirm with a worktree A/B on the same host.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import (  # noqa: E402
    CALIB_CODEC_REF,
    CALIB_PY_REF,
    CALIB_REF,
    CALIB_SHUFFLE_REF,
    CODEC_AXIS,
    PY_AXIS,
    SHUFFLE_AXIS,
)


def load(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    if "queries" in raw:
        return raw
    # driver capture format: the parsed record or a raw tail
    if isinstance(raw.get("parsed"), dict):
        return raw["parsed"]
    raise SystemExit(f"{path}: no usable queries record")


# Queries RETIRED from the headline whose historical records were
# recorded (and must stay comparable) on a non-JVM axis — bench.py's
# live axis sets are headline subsets, so retirement would otherwise
# silently reclassify every old record's entry to the JVM axis (r13
# review: zip_archive_roundtrip is exactly the 2-4x-codec-drift class
# the codec axis exists for).
LEGACY_AXES: dict[str, str] = {
    "zip_archive_roundtrip": "cdc",
    # binary_hamming_topk (also retired r13) was always JVM-axis — no
    # override needed.
}


def _axis(name: str) -> str:
    if name in CODEC_AXIS:
        return "cdc"
    if name in SHUFFLE_AXIS:
        return "shf"
    if name in PY_AXIS:
        return "py "
    return LEGACY_AXES.get(name, "jvm")


def norm(rec: dict) -> dict[str, float]:
    calib = rec.get("calib_sec") or CALIB_REF
    calib_py = rec.get("calib_py_sec") or CALIB_PY_REF
    # records before r8 carry no codec calib: fall back to the Python
    # axis for codec queries (the pre-r8 normalization), keeping old
    # records comparable to themselves. Likewise records before r13
    # carry no shuffle calib: SHUFFLE_AXIS queries fall back to the JVM
    # axis there (their pre-r13 normalization).
    calib_codec = rec.get("calib_codec_sec")
    calib_shuffle = rec.get("calib_shuffle_sec")
    scale = {
        "jvm": CALIB_REF / calib,
        "py ": CALIB_PY_REF / calib_py,
        "cdc": (
            CALIB_CODEC_REF / calib_codec
            if calib_codec
            else CALIB_PY_REF / calib_py
        ),
        "shf": (
            CALIB_SHUFFLE_REF / calib_shuffle
            if calib_shuffle
            else CALIB_REF / calib
        ),
    }
    return {n: t * scale[_axis(n)] for n, t in rec["queries"].items()}


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    p_old = old.get("calib_protocol", "single-shot")
    p_new = new.get("calib_protocol", "single-shot")
    if p_old != p_new:
        print(
            f"WARNING: calibration protocols differ ({p_old} vs {p_new}) — "
            "median-of-3 reads ~2x lower than single-shot on the same "
            "host, so EVERY ratio below carries that uniform bias; only "
            "relative ordering is meaningful across this boundary."
        )
    q_old = old.get("query_protocol", "single")
    q_new = new.get("query_protocol", "single")
    if q_old != q_new:
        print(
            f"NOTE: per-query timing protocols differ ({q_old} vs {q_new}) "
            "— min-of-2 equals single-shot on quiet hosts but reads lower "
            "under transient stalls, so isolated regressions across this "
            "boundary are understated, improvements overstated."
        )
    a, b = norm(old), norm(new)
    both = sorted(set(a) & set(b))
    moved = []
    for n in both:
        if a[n] <= 0:
            continue
        r = b[n] / a[n]
        if r > threshold or r < 1 / threshold:
            moved.append((r, n))
    ab = new.get("ab") or {}
    for r, n in sorted(moved, reverse=True):
        adj = f"  ab={ab[n]}x" if n in ab else ""
        print(f"{r:6.2f}x  [{_axis(n)}]  {n}  ({a[n]:.2f}s -> {b[n]:.2f}s norm){adj}")
    # VERDICT r11 #8: a normalized regression past 1.35x in the NEW
    # record without a structured A/B entry is exactly the class that
    # shipped un-adjudicated in r11 — make it impossible to miss.
    # Scanned over ALL shared queries, NOT the threshold-filtered
    # `moved` list: a custom display threshold above 1.35 must not
    # silence the adjudication guard (r12 review finding).
    unadj = [
        (b[n] / a[n], n)
        for n in both
        if a[n] > 0 and b[n] / a[n] > 1.35 and n not in ab
    ]
    for r, n in sorted(unadj, reverse=True):
        print(
            f"WARNING: {n} regressed {r:.2f}x normalized with NO 'ab' "
            f"adjudication in the new record — run the CLAUDE.md "
            f"median-of-3 / worktree A/B protocol before recording."
        )
    # ADVICE r12 #3: an 'ab' entry must not become a permanent shield —
    # if the recorded normalized ratio exceeds the adjudicated code-ratio
    # by the same 1.35x margin, something NEW regressed since that
    # adjudication was measured; re-run the A/B.
    stale = [
        (b[n] / a[n], n, ab[n])
        for n in both
        if a[n] > 0 and n in ab and ab[n] > 0 and b[n] / a[n] > ab[n] * 1.35
    ]
    for r, n, adj in sorted(stale, reverse=True):
        print(
            f"WARNING: {n} reads {r:.2f}x normalized but its 'ab' entry "
            f"adjudicated only {adj}x — the adjudication is STALE for "
            f"this reading; re-run the A/B before trusting it."
        )
    if not moved:
        print(f"no per-axis normalized movement beyond {threshold}x "
              f"({len(both)} shared queries)")
    only_old = sorted(set(a) - set(b))
    only_new = sorted(set(b) - set(a))
    if only_old:
        print("only in OLD:", ", ".join(only_old))
    if only_new:
        print("only in NEW:", ", ".join(only_new))
    ta = sum(a[n] for n in both)
    tb = sum(b[n] for n in both)
    print(f"shared-set normalized total: {ta:.1f}s -> {tb:.1f}s "
          f"({tb / ta:.2f}x)")


if __name__ == "__main__":
    main()
