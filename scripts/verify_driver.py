"""Driver simulation: load /root/repo/__spark_entry__.py the way the
grading driver does (file-location import, foreign cwd), smoke-check
entry(), and compare every queries() entry against its oracle_sql() in
DuckDB at sf0.01 — row count, sorted column names, sorted stringified
row values.

Run from anywhere: python /root/repo/scripts/verify_driver.py [sf_dir] [substr...]
Extra args filter the query list by substring match (entry() still runs).
Exit code 0 iff everything matches.
"""

from __future__ import annotations

import importlib.util
import sys

REPO = "/root/repo"


def norm(v):
    """Canonicalize a cell value at FULL precision.

    Deliberately stricter than round 1: no integral-float collapsing (a
    Spark long 123 vs a DuckDB pandas-bridge float 123.0 must MISMATCH here,
    because the real driver's value hash sees them differently — the fix is
    to emit DOUBLE on both sides, per CLAUDE.md), and no %.6g rounding (a
    last-ulp double divergence must surface, not hide).
    """
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm(x) for x in v) + "]"
    # DuckDB fetchdf() surfaces SQL NULL as NaN/NaT; Spark collect() as None
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # VANILLA session, exactly like the grading driver — NOT the repo's
    # get_spark(). Round 1 proved the difference matters: get_spark() set
    # nanosAsLong/UTC and masked a driver-only crash in 25 queries. Every
    # load-bearing conf must be applied by the queries themselves
    # (io._ensure_session_confs) or the gate must fail.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    df = mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.schema.simpleString()[:120]}...")
    assert n >= 0

    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    if len(sys.argv) > 2:
        pats = sys.argv[2:]
        queries = {
            n: f for n, f in queries.items() if any(p in n for p in pats)
        }
    failures = []
    for name, fn in queries.items():
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        # The real driver canonicalizes via pandas sort_values over ALL
        # columns — INCLUDING rows-only queries — which raises
        # "unhashable type: 'list'" on array cells (round-2:
        # embedding_quantize_int8; round-13: multimodal_features banked
        # an ERR because this guard used to run only on the oracled
        # path, below the rows-only early-continue — ADVICE r13).
        # Every registered query must emit scalars only.
        arr_cols = [
            f.name for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if arr_cols:
            failures.append(
                f"{name}: non-scalar columns {arr_cols} — the driver's "
                "canonicalizer cannot sort these; stringify them"
            )
            print(f"  {name}: {len(srows)} rows  MISMATCH (non-scalar cols)")
            continue
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(srows)} rows  [no oracle]")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        dcols = sorted(ddf.columns)
        ok = True
        if scols != dcols:
            failures.append(f"{name}: columns {scols} != {dcols}")
            ok = False
        elif len(srows) != len(ddf):
            failures.append(f"{name}: rowcount {len(srows)} != {len(ddf)}")
            ok = False
        else:
            s_sorted = sorted(
                tuple(norm(r[c]) for c in scols) for r in srows
            )
            d_sorted = sorted(
                tuple(norm(v) for v in row)
                for row in ddf[dcols].itertuples(index=False, name=None)
            )
            n_bad = sum(1 for a, b in zip(s_sorted, d_sorted) if a != b)
            if n_bad:
                for a, b in zip(s_sorted, d_sorted):
                    if a != b:
                        failures.append(f"{name}: value mismatch\n  spark={a}\n  duck ={b}")
                        break
                ok = False
        print(f"  {name}: {len(srows)} rows  {'OK' if ok else 'MISMATCH'}")
    spark.stop()

    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print(f"\nAll {len(queries)} queries verified against sf_dir={sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
