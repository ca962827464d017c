"""Exact-oracle ANN family (r13, VERDICT r12 #5): IVF / PQ / IVF-PQ with
deterministic integer training — oracle matches, recall floors, and the
null-hygiene invariant (ADVICE r12 #1)."""

import pytest
from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import annx, similarity

from .oracle import assert_query_matches

ANNX_QUERIES = [
    "embedding_topk_ivf",
    "embedding_topk_pq",
    "embedding_topk_ivfpq",
]


@pytest.mark.parametrize("name", ANNX_QUERIES)
@pytest.mark.sweep
def test_annx_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize(
    ("fn", "floor"),
    [
        (annx.ivf_topk_exact, 0.5),
        (annx.pq_topk_exact, 0.5),
        (annx.ivfpq_topk_exact, 0.4),
    ],
    ids=["ivf", "pq", "ivfpq"],
)
def test_annx_recall_vs_brute_force(spark, sf_medium, fn, floor):
    """Deterministic training must not cost recall vs the float-KMeans
    family's own floors (measured at sf0.01: ivf 0.61, pq 0.64,
    ivfpq 0.55)."""
    emb = io_mod.load_table(spark, sf_medium, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in fn(emb).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= floor, f"recall {recall:.2f} below {floor}"


@pytest.mark.parametrize(
    "fn",
    [annx.ivf_topk_exact, annx.pq_topk_exact],
    ids=["ivf", "pq"],
)
def test_annx_null_and_ragged_rows_are_filtered(spark, sf_medium, fn):
    """A NULL or ragged embedding row must change NOTHING: the Spark
    path filters them (instead of crashing np.vstack) exactly like the
    oracle's emb CTE drops them (ADVICE r12 #1). Covers both kernel
    shapes: the cell-assign path (ivf; ivfpq shares it) and the
    encode/ADC-scan path (pq)."""
    emb = io_mod.load_table(spark, sf_medium, "embeddings")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    # row-level poison (NULL row, ragged row) AND element-level poison
    # (full-length rows with one NULL / one NaN element — the r13
    # review's silent-divergence class: floor(NaN) int-casts to an
    # undefined sentinel in the kernels while DuckDB list_sum skips it)
    nan_row = [0.1] * 63 + [float("nan")]
    null_elem_row = [0.1] * 63 + [None]
    poison = spark.createDataFrame(
        [
            (max_id + 1, None, 0),
            (max_id + 2, [0.25, -0.125, 0.5], 0),
            (max_id + 3, nan_row, 0),
            (max_id + 4, null_elem_row, 0),
        ],
        schema="vec_id long, embedding array<float>, label int",
    )
    clean = fn(emb).collect()
    dirty = fn(emb.unionByName(poison)).collect()
    assert sorted(map(tuple, clean)) == sorted(map(tuple, dirty))


def test_annx_repeat_run_is_identical(spark, sf_medium):
    """Determinism is the whole point: an immediate re-run (fresh index
    training included) returns the identical result set."""
    emb = io_mod.load_table(spark, sf_medium, "embeddings")
    a = {tuple(r) for r in annx.pq_topk_exact(emb).collect()}
    b = {tuple(r) for r in annx.pq_topk_exact(emb).collect()}
    assert a == b


def test_annx_oracles_embed_shared_constants():
    """The oracle generators and the Spark kernels read the SAME
    module-level hyperparameters (ADVICE r12 #2) — spot-check that the
    generated SQL actually carries them."""
    keep = annx.ANNX_K * annx.ANNX_RERANK
    for sql in (annx.ivfx_oracle(), annx.pqx_oracle(), annx.ivfpqx_oracle()):
        assert f"< {annx.ANNX_N_QUERIES}" in sql
        assert f"rnk <= {annx.ANNX_K}" in sql
    for sql in (annx.pqx_oracle(), annx.ivfpqx_oracle()):
        assert f"rn <= {keep}" in sql
    assert f"rn <= {annx.IVFX_PROBE}" in annx.ivfx_oracle()
