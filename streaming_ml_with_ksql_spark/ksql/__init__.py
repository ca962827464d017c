"""KSQL statement-compatibility layer.

Lets a user of the reference run the *literal statements* from its runbook
(reference: README.md:27-70) against this engine — CREATE STREAM/TABLE
over topics, CSAS/CTAS with hopping windows, rekeys, rowtime/rowkey
pseudo-columns, TIMESTAMPTOSTRING / as_array builtins, and the predict()
scoring projection — translated onto DataFrame/Spark-SQL plans.
"""

from .compat import KsqlCompat

__all__ = ["KsqlCompat"]
