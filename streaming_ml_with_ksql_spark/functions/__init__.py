"""Scalar-function parity with the reference's invoked KSQL builtins
(TIMESTAMPTOSTRING, as_array — SURVEY.md §2.2) plus the engine's own
scalar library. All JVM-side `pyspark.sql.functions` compositions —
no Python UDFs in the scalar path."""

from .scalars import as_array, timestamp_to_string

__all__ = ["as_array", "timestamp_to_string"]
