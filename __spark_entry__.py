"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``streaming_ml_with_ksql_spark.registry``, which binds
every implemented operator from SURVEY.md §2 (plus the north-star
training-data-pipeline operators) to a PySpark query and a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_ml_with_ksql_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference README.md:41-50: hopping-window per-user
    aggregate) on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["hopping_window_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
