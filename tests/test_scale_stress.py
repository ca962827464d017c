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
