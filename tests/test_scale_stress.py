"""Scale-replication stress invariants — the pytest form of
scripts/stress_scale.py's linearity claims (round-3 verdict asked for the
claims to live in the round gate, not a side script).

Construction: the sf0.01 documents table is replicated MULT× with shifted
doc_ids and a per-replica alphabet ROTATION on the text. A character
bijection preserves every within-replica token-shingle Jaccard exactly
(shingle sets map bijectively) while making cross-replica texts dissimilar
— so the TRUE near-dup structure replicates exactly MULT×, never
quadratically. That separates the two quantities the 100 TB design hinges
on: corpus size (×MULT) vs true duplication (×MULT, by construction).

Invariants asserted:
- the EXACT n-gram Jaccard pair count scales ×MULT (deterministic — no
  LSH recall in the loop), and no pair spans replicas;
- dedup-group sizes replicate as a multiset (components machinery);
- wall time for the minhash→components chain stays within a generous
  linear envelope — an O(n²)-pairs regression (×MULT² work) would blow
  through it while machine noise does not.
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import graph, text

MULT = 4
ID_STEP = 1_000_000
_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _replica(docs, i: int):
    shifted = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_STEP))
    if i == 0:
        return shifted
    rot = _ALPHA[i * 7 :] + _ALPHA[: i * 7]
    return shifted.withColumn(
        "text",
        F.translate("text", _ALPHA + _ALPHA.upper(), rot + rot.upper()),
    )


@pytest.mark.slow
def test_dedup_cost_tracks_true_duplication_not_corpus_squared(spark, sf_medium):
    docs1 = io_mod.load_table(spark, sf_medium, "documents").localCheckpoint(
        eager=True
    )
    big = _replica(docs1, 0)
    for i in range(1, MULT):
        big = big.unionByName(_replica(docs1, i))
    # materialize so the replication build cost stays out of the timings
    docs4 = big.localCheckpoint(eager=True)

    # ---- structural invariants on the EXACT pair op (no LSH recall) ----
    exact1 = text.ngram_jaccard_pairs(docs1).select("doc_a", "doc_b")
    n_exact1 = exact1.count()
    exact4 = text.ngram_jaccard_pairs(docs4).select("doc_a", "doc_b")
    cross = exact4.filter(
        (F.col("doc_a") / ID_STEP).cast("long")
        != (F.col("doc_b") / ID_STEP).cast("long")
    ).count()
    assert cross == 0, "alphabet-rotated replicas must not be near-dups"
    n_exact4 = exact4.count()
    assert n_exact4 == MULT * n_exact1, (n_exact1, n_exact4)

    # ---- timed chain: minhash pairs → connected components ----
    def chain(docs):
        pairs = text.near_dup_pairs_minhash(docs)
        comp = graph.dedup_groups(docs, pairs)
        return sorted(r["group_size"] for r in comp.collect())

    t0 = time.perf_counter()
    sizes1 = chain(docs1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    sizes4 = chain(docs4)
    t4 = time.perf_counter() - t0

    # components replicate as a multiset (each 1x group appears MULT times)
    assert sizes4 == sorted(sizes1 * MULT)
    # linear envelope: MULT x data / MULT x edges should cost ~MULT x plus
    # fixed overhead; a pairs-quadratic regression costs ~MULT^2 x.
    assert t4 <= 1.5 * MULT * t1 + 15.0, (t1, t4)


@pytest.mark.slow
def test_duplicate_span_structure_replicates_linearly(spark, sf_medium):
    """The span index under MULT× replication: the alphabet rotation is a
    token bijection, so every within-replica duplicate 8-gram maps
    bijectively — per-document coverage replicates EXACTLY as a multiset,
    total duplicated positions scale ×MULT, and no duplicate gram may
    span replicas. A quadratic (cross-replica) regression would break the
    gram-frequency invariant immediately."""
    docs1 = io_mod.load_table(spark, sf_medium, "documents").localCheckpoint(
        eager=True
    )
    big = _replica(docs1, 0)
    for i in range(1, MULT):
        big = big.unionByName(_replica(docs1, i))
    docs4 = big.localCheckpoint(eager=True)

    cov1 = sorted(
        (r.n_tokens, r.dup_positions)
        for r in text.duplicate_span_coverage(docs1).collect()
    )
    t0 = time.perf_counter()
    cov4 = sorted(
        (r.n_tokens, r.dup_positions)
        for r in text.duplicate_span_coverage(docs4).collect()
    )
    t4 = time.perf_counter() - t0
    assert cov4 == sorted(cov1 * MULT)

    # no duplicate gram spans replicas: every position's gram frequency
    # is replica-local, so n_docs of every span is unchanged at MULT x
    span1 = text.duplicate_span_positions(docs1)
    span4 = text.duplicate_span_positions(docs4)
    a = sorted(
        (r.doc_id % ID_STEP, r.pos, r.n_docs, r.n_occurrences)
        for r in span1.collect()
    )
    b = sorted(
        (r.doc_id % ID_STEP, r.pos, r.n_docs, r.n_occurrences)
        for r in span4.filter(F.col("doc_id") < ID_STEP).collect()
    )
    assert a == b
    assert t4 < 120.0, t4  # sanity ceiling; 4x corpus, window single-shuffle


@pytest.mark.slow
def test_triangle_counting_scales_linearly_with_replicated_structure(
    spark, sf_medium
):
    """VERDICT r5 #7: the degree-ordered wedge join. Replicating the real
    near-dup edge set MULT× with shifted vertex ids replicates the true
    triangle structure exactly ×MULT (edges are replica-local by
    construction), so per-vertex triangle counts and clustering
    coefficients must replicate as multisets, and wall time must stay in
    a linear envelope — an orientation regression (wedges from full
    degrees, the 'last reducer' failure) scales with the square of the
    hub degree and would blow through it."""
    from streaming_ml_with_ksql_spark.operators import similarity

    emb = io_mod.load_table(spark, sf_medium, "embeddings")
    edges1 = (
        similarity.embedding_near_dup_pairs_blocked(emb)
        .select("vec_a", "vec_b")
        .localCheckpoint(eager=True)
    )
    big = edges1
    for i in range(1, MULT):
        big = big.unionByName(
            edges1.select(
                (F.col("vec_a") + F.lit(i * ID_STEP)).alias("vec_a"),
                (F.col("vec_b") + F.lit(i * ID_STEP)).alias("vec_b"),
            )
        )
    edges4 = big.localCheckpoint(eager=True)

    def tri_sizes(edges):
        return sorted(
            (r.vertex % ID_STEP, r.n_triangles)
            for r in graph.triangle_counts(
                edges, src="vec_a", dst="vec_b"
            ).collect()
        )

    t0 = time.perf_counter()
    tri1 = tri_sizes(edges1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    tri4 = tri_sizes(edges4)
    t4 = time.perf_counter() - t0
    assert len(tri1) > 0 and tri4 == sorted(tri1 * MULT)
    assert t4 <= 1.5 * MULT * t1 + 15.0, (t1, t4)

    def cc(edges):
        # the registry's clustering-coefficient composition: 2T/(d(d-1))
        tri = graph.triangle_counts(edges, src="vec_a", dst="vec_b")
        deg = (
            edges.select(F.col("vec_a").alias("vertex"))
            .unionAll(edges.select(F.col("vec_b").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        joined = tri.join(deg, "vertex").select(
            "vertex",
            F.when(
                F.col("degree") > 1,
                F.round(
                    2.0 * F.col("n_triangles")
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
        return sorted((r.vertex % ID_STEP, r.coeff) for r in joined.collect())

    assert cc(edges4) == sorted(cc(edges1) * MULT)


@pytest.mark.slow
def test_curation_composite_collapses_exact_duplication(
    spark, sf_medium, tmp_path
):
    """VERDICT r5 #7: the full curation pass at MULT× exact duplication.
    Replicas shift doc_ids by a multiple of 97 (preserving the
    train/bench split residue), so every replica is an exact text copy:
    the near-dup stage must collapse each cross-replica group onto its
    min-id (replica-0) representative and the ENTIRE pipeline output —
    survivors, BPE token counts, packing layout — must equal the 1×
    run exactly. That is the operational meaning of dedup-before-train,
    and a recall loss or nondeterministic representative choice breaks
    it immediately. Wall time stays in a linear envelope."""
    from streaming_ml_with_ksql_spark import registry

    step = 97 * 10_000  # keeps doc_id % 97 per replica
    docs1 = io_mod.load_table(spark, sf_medium, "documents")
    big = docs1
    for i in range(1, MULT):
        big = big.unionByName(
            docs1.withColumn("doc_id", F.col("doc_id") + F.lit(i * step))
        )
    rep_dir = str(tmp_path / "dup_corpus")
    import os

    os.makedirs(rep_dir)
    big.write.mode("overwrite").parquet(f"{rep_dir}/documents.parquet")

    q = registry.queries()["corpus_curation_pipeline"]
    t0 = time.perf_counter()
    out1 = sorted(tuple(r) for r in q(spark, sf_medium).collect())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out4 = sorted(tuple(r) for r in q(spark, rep_dir).collect())
    t4 = time.perf_counter() - t0
    assert len(out1) > 0
    assert out4 == out1, (
        f"curation output changed under exact duplication: "
        f"{len(out1)} vs {len(out4)} rows"
    )
    assert t4 <= 1.5 * MULT * t1 + 20.0, (t1, t4)
