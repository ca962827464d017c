"""Round-15 optimization guards: parity pins for the row-local
repetition-stats kernel and the one-pass classification report, plus the
DBSCAN foreign-endpoint mask and the kmeans ragged-frame gate (ADVICE
r14)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark.operators import clustering, text


EDGE_DOCS = [
    (1, "alpha beta alpha beta alpha"),
    (2, "single"),
    (3, ""),                      # split('') -> [''] (one empty token)
    (4, None),                    # NULL text -> NULL token array -> dropped
    (5, "x x x x x x"),
    (6, "a b c d e f g a b c"),
    (7, "☃ \U0001F600 ☃"),  # astral / BMP symbols
    (8, "tie tie breaker breaker"),
]


def _rep_both(spark, df):
    fast = text.repetition_stats(df).collect()
    slow = text.repetition_stats(df, row_local=False).collect()
    return (
        {r["doc_id"]: tuple(r) for r in fast},
        {r["doc_id"]: tuple(r) for r in slow},
    )


def test_repetition_stats_kernel_matches_relational_edge_docs(spark):
    df = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    fast, slow = _rep_both(spark, df)
    assert fast == slow
    # NULL text vanishes on both paths (explode semantics)
    assert 4 not in fast


def test_repetition_stats_kernel_matches_relational_sf001(spark):
    from streaming_ml_with_ksql_spark import io

    docs = io.load_table(spark, "/root/testdata/sf0.01", "documents")
    fast, slow = _rep_both(spark, docs)
    assert fast == slow and len(fast) == 500


def test_repetition_stats_kernel_null_token_elements(spark):
    """A precomputed token array with NULL elements must group all NULLs
    as one term on both paths (pd.factorize use_na_sentinel=False)."""
    df = spark.createDataFrame(
        [(1, ["a", None, "a", None, None])],
        "doc_id long, t array<string>",
    )
    fast = text.repetition_stats(df, tokens="t").collect()
    slow = text.repetition_stats(df, tokens="t", row_local=False).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    # 2 distinct terms: 'a' and NULL; max multiplicity 3 (the NULLs)
    assert fast[0]["distinct_word_frac"] == 0.4


def test_classification_report_one_pass_values(spark):
    from streaming_ml_with_ksql_spark.ml.metrics import classification_report

    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")],
        "lab string, prd string",
    )
    rows = {
        r["class"]: r
        for r in classification_report(df, "lab", "prd").collect()
    }
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["n_true_d"] == 2.0 and rows["a"]["n_pred_d"] == 2.0
    assert rows["a"]["tp_d"] == 1.0 and rows["a"]["precision"] == 0.5
    assert rows["c"]["n_pred_d"] == 0.0 and rows["c"]["f1"] == 0.0


def test_dbscan_kernel_drops_foreign_edge_endpoints(spark):
    """ADVICE r14: an eps-pair endpoint absent from the weight frame is
    dropped by the relational inner join; the kernel must do the same
    instead of attributing it to the lexically-next rep."""
    members = spark.createDataFrame(
        [(1, 1), (4, 1), (5, 1), (2, 2), (10, 10)],
        "vec_id long, rep long",
    )
    # edge (2,7): 7 is not a rep -> must be ignored entirely
    pairs = spark.createDataFrame(
        [(1, 2), (2, 7)], "vec_a long, vec_b long"
    )
    fast = clustering.dbscan_from_weighted_pairs(
        members, pairs, min_neighbors=2, single_task=True
    )
    slow = clustering.dbscan_from_weighted_pairs(
        members, pairs, min_neighbors=2, single_task=False
    )
    fa = {r["vec_id"]: (r["role"], r["cluster_id"]) for r in fast.collect()}
    sl = {r["vec_id"]: (r["role"], r["cluster_id"]) for r in slow.collect()}
    assert fa == sl and set(fa) == {1, 4, 5, 2, 10}


def _minhash_both(df, **kw):
    fast = text.near_dup_pairs_minhash(df, single_task=True, **kw)
    slow = text.near_dup_pairs_minhash(df, single_task=False, **kw)
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    return (
        {key(r): r["jaccard"] for r in fast.collect()},
        {key(r): r["jaccard"] for r in slow.collect()},
    )


def test_minhash_single_task_matches_distributed_sf001(spark):
    from streaming_ml_with_ksql_spark import io

    docs = io.load_table(spark, "/root/testdata/sf0.01", "documents")
    fast, slow = _minhash_both(docs)
    assert fast == slow and len(fast) > 0


def test_minhash_single_task_matches_distributed_planted(spark):
    """Planted near-dups + exact dups + disjoint docs; jaccard doubles
    must agree bitwise (the division/round run in Spark on both paths)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " one two three four five six seven eight nine ten"),
        (2, base + " one two three four five six seven eight nine zzz"),
        (3, base + " one two three four five six seven eight nine ten"),
        (4, "completely different text with no overlap at all here body"),
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast, slow = _minhash_both(df)
    assert fast == slow and (1, 3) in fast and fast[(1, 3)] == 1.0


def test_minhash_gate_uses_row_hint(spark):
    """No hint -> distributed; small hint -> kernel (MapInPandas node)."""
    from streaming_ml_with_ksql_spark.operators import sizing

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    auto = text.near_dup_pairs_minhash(df)  # hint-less derived frame
    assert "MapInPandas" not in auto._jdf.queryExecution().executedPlan().toString()
    setattr(df, sizing.ROW_HINT_ATTR, 2)
    auto2 = text.near_dup_pairs_minhash(df)
    assert "MapInPandas" in auto2._jdf.queryExecution().executedPlan().toString()


def test_ngram_pairs_single_task_matches_distributed_sf001(spark):
    from streaming_ml_with_ksql_spark import io

    docs = io.load_table(spark, "/root/testdata/sf0.01", "documents")
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    fast = {
        key(r): r["jaccard"]
        for r in text.ngram_jaccard_pairs(docs, single_task=True).collect()
    }
    slow = {
        key(r): r["jaccard"]
        for r in text.ngram_jaccard_pairs(docs, single_task=False).collect()
    }
    assert fast == slow and len(fast) > 0


def test_ngram_pairs_single_task_planted(spark):
    rows = [
        (7, "a b c d e f g h"),
        (3, "a b c d e f g zz"),   # high overlap with 7 (and id 3 < 7)
        (9, "a b c d e f g h"),    # exact dup of 7
        (11, "q r s t u v w x"),   # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    fast = {
        key(r): r["jaccard"]
        for r in text.ngram_jaccard_pairs(df, single_task=True).collect()
    }
    slow = {
        key(r): r["jaccard"]
        for r in text.ngram_jaccard_pairs(df, single_task=False).collect()
    }
    assert fast == slow and (7, 9) in fast and fast[(7, 9)] == 1.0


def test_kmeans_ragged_frame_falls_through_to_distributed(spark):
    """ADVICE r14: a ragged vector frame must not enter the single-task
    kernel (np.asarray would raise); the auto gate must pick the
    distributed loop and still converge."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = clustering.kmeans_fixed_point(df, k=2, iters=1)
    assert out.count() == 3
