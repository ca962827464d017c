"""Differential-test harness: run a registered PySpark query and its DuckDB
oracle on the same parquet tables and compare row count, column names and an
order-insensitive value comparison — mirroring the driver's correctness gate
(SURVEY.md §5.2).

Floats are compared with a relative tolerance (aggregation order differs
between engines); everything else must match exactly.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from streaming_ml_with_ksql_spark.io import TABLES

__all__ = ["run_oracle", "compare_frames", "assert_query_matches"]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null",)
        # round to 9 significant digits: engines sum floats in different orders
        return ("f", float(f"{v:.9g}"))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ("t", ts.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_canon(x) for x in v))
    if isinstance(v, (int,)) or type(v).__name__ in ("int64", "int32", "uint64"):
        return ("i", int(v))
    if pd.isna(v):
        return ("null",)
    return ("o", str(v))


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    srows, orows = _rows(spark_pdf), _rows(oracle_pdf)
    n_bad = 0
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a} oracle={b}")
    if n_bad:
        problems.append(f"{n_bad}/{len(srows)} sorted rows differ")
    return problems


def assert_query_matches(spark, name: str, sf_dir: str) -> None:
    from streaming_ml_with_ksql_spark import registry

    qd = registry._REGISTRY[name]
    spark_pdf = qd.spark(spark, sf_dir).toPandas()
    assert qd.oracle is not None, f"{name} has no oracle"
    oracle_pdf = run_oracle(qd.oracle, sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name} mismatch: " + "; ".join(problems)
