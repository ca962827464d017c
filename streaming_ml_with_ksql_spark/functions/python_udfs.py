"""Python-side UDF surface beyond `predict`: grouped-agg Pandas UDAF and
Python UDTF (SURVEY.md §2.6 — the reference's UDF story is the single
Java `predict` UDF, MlflowPredictUdf.java; a complete engine exposes the
full registration surface).

Both are deliberately OFF the hot path (CLAUDE.md scale rules): the UDAF
is Arrow-batched (one vectorized numpy call per group partition), the
UDTF is row-at-a-time Python and exists as the API-surface demo — the
production n-gram expansion is the JVM `text.shingles` expression. Each
carries an exact DuckDB oracle: median is order-independent (numpy's
interpolated median == DuckDB's quantile_cont(0.5) on identical values),
which is what makes a Python aggregate hash-comparable cross-engine —
order-SENSITIVE float reductions (sum/mean) would diverge run to run.

The pandas_udf/udtf decorators parse their DDL return types EAGERLY and
need an active SparkContext, so construction is deferred into the factory
functions — module import must work in a session-less process (the
grading driver imports __spark_entry__ before building its session).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

__all__ = ["grouped_median", "ngrams_udtf_frame"]


def _median_udaf():
    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return median_udaf


def grouped_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group median via the Arrow grouped-agg Pandas UDAF path (whole
    groups are delivered to the UDAF, unlike scalar pandas_udf batches)."""
    return df.groupBy(group_col).agg(
        _median_udaf()(F.col(value_col)).alias("median_value")
    )


class NgramsUDTF:
    """Python UDTF: lateral word-bigram expansion of a text cell with the
    output position. Registered demo of the table-function surface; the
    hot-path equivalent is `explode(text.shingles(tokens, 2))` (pure JVM).
    """

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.strip().lower().split()
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"


def ngrams_udtf_frame(documents: DataFrame) -> DataFrame:
    """(doc_id, pos, ngram) via the UDTF lateral join."""
    spark = documents.sparkSession
    spark.udtf.register(
        "sgraft_ngrams", udtf(NgramsUDTF, returnType="pos: int, ngram: string")
    )
    documents.select("doc_id", "text").createOrReplaceTempView(
        "sgraft_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.ngram
        FROM sgraft_udtf_docs d,
             LATERAL sgraft_ngrams(d.text) t
        """
    )
