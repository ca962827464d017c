"""Training-data prep operators: chunking, packing, PII scrub, domain mix.

Oracle equivalence is covered by verify_driver/the grading driver; these
tests pin the *semantic invariants* that SQL equivalence alone wouldn't
(conservation, budgets, determinism, planted-PII behavior).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import text


def test_chunk_tokens_conserves_and_bounds(spark, sf_medium):
    docs = io_mod.load_table(spark, sf_medium, "documents")
    chunks = text.chunk_tokens(docs, chunk_size=7)
    # Every chunk within budget, at least one token.
    bad = chunks.filter(
        (F.col("n_tokens") > 7) | (F.col("n_tokens") < 1)
    ).count()
    assert bad == 0
    # Per-doc conservation: chunk token counts sum to the doc token count,
    # and chunk ids are exactly 0..k-1.
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.count("*").alias("k"),
        F.max("chunk_id").alias("max_id"),
        F.min("chunk_id").alias("min_id"),
    )
    truth = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    joined = per_doc.join(truth, "doc_id")
    bad = joined.filter(
        (F.col("tok_sum") != F.col("n_tok"))
        | (F.col("min_id") != 0)
        | (F.col("max_id") != F.col("k") - 1)
    ).count()
    assert bad == 0


def test_pack_sequences_offsets_are_contiguous(spark, sf_medium):
    docs = io_mod.load_table(spark, sf_medium, "documents")
    packed = text.pack_sequences(docs, budget=97, num_shards=4)
    # Within a shard, start offsets are the exclusive prefix sum of token
    # counts in a deterministic order — so offset+n_tokens of the k-th row
    # equals the (k+1)-th row's offset; globally, tokens are conserved.
    from pyspark.sql import Window

    # doc_id tiebreak: zero-token docs share a start_offset, and lead()
    # over a non-unique order is partition-order-dependent
    w = Window.partitionBy("shard").orderBy("start_offset", "doc_id")
    chained = packed.withColumn(
        "next_off", F.lead("start_offset").over(w)
    ).filter(F.col("next_off").isNotNull())
    bad = chained.filter(
        F.col("start_offset") + F.col("n_tokens") != F.col("next_off")
    ).count()
    assert bad == 0
    # pack_id is the budget-quotient of the start offset.
    bad = packed.filter(
        F.col("pack_id") != F.floor(F.col("start_offset") / 97)
    ).count()
    assert bad == 0
    # Deterministic: two independent plans agree exactly.
    again = text.pack_sequences(docs, budget=97, num_shards=4)
    assert packed.exceptAll(again).count() == 0


def test_pii_scrub_planted_spans(spark):
    rows = [
        (1, "contact me at alice@example.com or +1 (555) 123-4567 now"),
        (2, "server at 10.0.0.1 and 192.168.1.255, no mail"),
        (3, "clean text with nothing sensitive at all"),
        (4, "two mails: a@b.io c.d@e-f.org and ip 8.8.8.8"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in text.pii_scrub(docs).collect()
    }
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_ipv4"] == 2 and out[2]["n_emails"] == 0
    assert out[3]["n_emails"] == out[3]["n_ipv4"] == out[3]["n_phones"] == 0
    assert out[4]["n_emails"] == 2 and out[4]["n_ipv4"] == 1
    # Scrubbed text of the clean doc is unchanged (md5 of original).
    orig_md5 = docs.filter("doc_id = 3").select(
        F.md5("text").alias("m")
    ).first()["m"]
    assert out[3]["scrubbed_md5"] == orig_md5
    # Redaction actually removed the spans from doc 1 (length shrank to
    # the sentinel'd form, deterministically).
    assert out[1]["scrubbed_len"] < len(rows[0][1])


def test_domain_mix_weights_normalize(spark, sf_medium):
    docs = io_mod.load_table(spark, sf_medium, "documents")
    mix = text.domain_mix_weights(docs).collect()
    assert abs(sum(r["doc_share"] for r in mix) - 1.0) < 1e-9
    # Uniform-target property: weight * n_tokens is the same constant
    # (total/n_sources) for every source.
    consts = {round(r["uniform_weight"] * r["n_tokens"], 6) for r in mix}
    assert len(consts) == 1
    assert all(r["uniform_weight"] > 0 for r in mix)


def test_ngram_lm_score_orders_fluency(spark):
    """A doc made of the corpus's dominant bigram pattern must outscore a
    doc of one-off bigrams: the model is trained on the corpus itself, so
    mean conditional probability ranks repeated constructions higher."""
    from streaming_ml_with_ksql_spark.operators import text

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "zq wx kj vb nm pl"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.ngram_lm_score(docs).collect()}
    fluent = out[0]
    odd = out[100]
    assert fluent.n_bigrams == 5 and odd.n_bigrams == 5
    assert fluent.avg_cond_prob > odd.avg_cond_prob
    # every conditional probability is a true probability
    assert 0.0 < odd.avg_cond_prob < fluent.avg_cond_prob <= 1.0


def test_duplicate_spans_planted_fixture(spark):
    """Two documents sharing one exact 8-token run (at different offsets)
    and otherwise unique text: the span index must report exactly the
    shared gram at both positions, and coverage must count exactly 8
    covered positions per doc."""
    from streaming_ml_with_ksql_spark.operators import text as t

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    d1 = "u1 u2 u3 " + shared + " v1 v2"
    d2 = "w1 " + shared + " x1 x2 x3 x4"
    d3 = "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    spans = t.duplicate_span_positions(df, k=8).collect()
    assert {(r.doc_id, r.pos) for r in spans} == {(1, 3), (2, 1)}
    assert all(r.n_docs == 2 and r.n_occurrences == 2 for r in spans)
    cov = {r.doc_id: r for r in t.duplicate_span_coverage(df, k=8).collect()}
    assert cov[1].dup_positions == 8 and cov[2].dup_positions == 8
    assert cov[3].dup_positions == 0 and cov[3].dup_fraction == 0.0
    assert abs(cov[1].dup_fraction - 8 / 13) < 1e-12


def test_duplicate_span_coverage_interval_union(spark):
    """Overlapping duplicate grams must union, not double-count: doc A
    repeated verbatim in doc B makes EVERY position of A covered once."""
    from streaming_ml_with_ksql_spark.operators import text as t

    body = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, "solo text only here")],
        "doc_id long, text string",
    )
    cov = {r.doc_id: r for r in t.duplicate_span_coverage(df, k=8).collect()}
    # 12 tokens, 5 duplicate grams (positions 0..4), union covers all 12
    assert cov[1].dup_positions == 12 and cov[1].dup_fraction == 1.0
    assert cov[2].dup_positions == 12
    assert cov[3].dup_positions == 0


def test_passage_dedup_keep_first_semantics(spark):
    """Two docs opening with the same 32 tokens: the lower doc_id keeps
    the passage, the higher drops it; unique tails always survive; a doc
    made ENTIRELY of another doc's passages retains zero tokens."""
    from streaming_ml_with_ksql_spark.operators import text as t

    block = " ".join(f"w{i}" for i in range(32))
    d1 = block + " unique tail one"
    d2 = block + " different ending here indeed"
    d3 = block  # exactly one passage, fully duplicated
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in t.passage_dedup_stats(df).collect()}
    assert got[1].n_passages == 2 and got[1].kept_passages == 2
    assert got[1].kept_tokens == 35
    # doc 2 loses the shared block but keeps its 4-token tail passage
    assert got[2].n_passages == 2 and got[2].kept_passages == 1
    assert got[2].kept_tokens == 4
    assert got[3].n_passages == 1 and got[3].kept_passages == 0
    assert got[3].kept_tokens == 0


def test_bpe_pack_layout_consistent_with_counts(spark, sf_small):
    """corpus_bpe_pack's offsets must be the prefix sums of the SAME BPE
    counts bpe_tokenize reports, within each shard's salted order."""
    from streaming_ml_with_ksql_spark import registry
    from streaming_ml_with_ksql_spark.operators import bpe

    sio = __import__(
        "streaming_ml_with_ksql_spark.io", fromlist=["load_table"]
    )
    docs = sio.load_table(spark, sf_small, "documents")
    counts = {
        r.doc_id: r.n_bpe_tokens for r in bpe.bpe_tokenize(docs).collect()
    }
    packed = registry._REGISTRY["corpus_bpe_pack"].spark(spark, sf_small).collect()
    assert {r.doc_id for r in packed} == set(counts)
    by_shard: dict[int, list] = {}
    for r in packed:
        assert r.n_tokens == counts[r.doc_id]
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.start_offset)
        run = 0
        for r in rows:
            assert r.start_offset == run
            assert r.pack_id == run // 2048
            run += r.n_tokens


def test_hash_embed_feeds_similarity_operators(spark):
    """The hashing-trick embeddings are unit vectors that plug straight
    into the embedding operators: duplicate documents map to IDENTICAL
    vectors (cosine 1.0), disjoint-vocabulary documents to orthogonal
    ones, and the brute-force ANN over (vec_id, embedding) ranks the
    planted duplicate first."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark.operators import similarity, text

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely unrelated content"),
            (3, "the quick brown fox jumps over a sleepy dog"),
        ],
        "doc_id long, text string",
    )
    emb = text.hash_embed(docs)
    rows = {r.doc_id: r.embedding for r in emb.collect()}
    assert rows[0] == rows[1]  # exact duplicates → identical vectors
    import math

    for v in rows.values():  # unit norm (components rounded to 6 dp)
        assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-4
    dot02 = sum(a * b for a, b in zip(rows[0], rows[2]))
    assert abs(dot02) < 0.3  # disjoint vocab ≈ orthogonal

    topk = similarity.brute_force_topk(
        emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
        n_queries=1,
        k=2,
    ).collect()
    best = [r for r in topk if r.rnk == 1][0]
    assert best.neighbor_id == 1 and best.cosine == 1.0


def test_curation_pipeline_stage_containment(spark, sf_medium):
    """The composed curation pass must agree with its stages run alone:
    curated docs ⊆ clean survivors, disjoint from contaminated docs, and
    the pack layout's token totals equal the per-doc BPE counts."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as sio
    from streaming_ml_with_ksql_spark import registry
    from streaming_ml_with_ksql_spark.operators import bpe, text

    out = registry._REGISTRY["corpus_curation_pipeline"].spark(spark, sf_medium)
    rows = out.collect()
    curated = {r.doc_id for r in rows}
    assert len(curated) > 0

    docs = sio.load_table(spark, sf_medium, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    clean_ids = {r.doc_id for r in text.clean_corpus(train).collect()}
    contaminated = {
        r.doc_id
        for r in text.decontaminate(
            train, docs.filter(F.col("doc_id") % 97 == 0), n=4
        ).collect()
    }
    assert curated <= clean_ids
    assert not (curated & contaminated)
    assert curated == clean_ids - contaminated

    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_tokenize(docs, bpe.FIXED_MERGES).collect()
    }
    for r in rows:
        assert r.n_tokens == counts[r.doc_id]


def test_kcore_matches_pure_python_peeling(spark, sf_medium):
    """k-core is iterative (rows-only at the driver), so its correctness
    gate is exact parity with an independent pure-Python peeler on the
    real near-dup graph, for k=2 and k=3, plus the defining invariant:
    every core vertex keeps >= k neighbors inside the core."""
    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import graph, similarity

    emb = io_mod.load_table(spark, sf_medium, "embeddings")
    edges = [
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_dup_pairs_blocked(emb)
        .select("vec_a", "vec_b")
        .collect()
    ]

    def py_kcore(pairs, k):
        adj: dict = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for v in [v for v, ns in adj.items() if len(ns) < k]:
                for n in adj[v]:
                    adj[n].discard(v)
                del adj[v]
                changed = True
        return {v: len(ns) for v, ns in adj.items()}

    edf = spark.createDataFrame(edges, "vec_a long, vec_b long")
    for k in (2, 3):
        got = {
            r.vertex: r.core_degree
            for r in graph.kcore_vertices(
                edf, k=k, src="vec_a", dst="vec_b"
            ).collect()
        }
        want = py_kcore(edges, k)
        assert got == want, f"k={k}: {len(got)} vs {len(want)} vertices"
        # defining invariant, checked against the raw edge list
        core = set(got)
        neigh: dict = {}
        for a, b in edges:
            if a in core and b in core:
                neigh.setdefault(a, set()).add(b)
                neigh.setdefault(b, set()).add(a)
        assert all(len(neigh.get(v, ())) >= k for v in core)
    # non-empty at k=2 on this testdata, and 3-core ⊆ 2-core
    g2 = set(
        r.vertex
        for r in graph.kcore_vertices(edf, k=2, src="vec_a", dst="vec_b").collect()
    )
    g3 = set(
        r.vertex
        for r in graph.kcore_vertices(edf, k=3, src="vec_a", dst="vec_b").collect()
    )
    assert g2 and g3 <= g2


def test_sliding_chunks_tile_with_overlap(spark):
    """On synthetic long docs the sliding windows must tile the token
    range exactly: chunk k starts at k*stride, every window is
    chunk_size tokens except possibly the last, the final window ends
    at n, and consecutive windows overlap by chunk_size - stride."""
    from streaming_ml_with_ksql_spark.operators.text import (
        chunk_tokens_sliding,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(700))),
            (2, " ".join(f"t{i}" for i in range(256))),
            (3, " ".join(f"t{i}" for i in range(10))),
            (4, " ".join(f"t{i}" for i in range(449))),
        ],
        "doc_id long, text string",
    )
    out = chunk_tokens_sliding(docs, chunk_size=256, stride=192)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = {1: 700, 2: 256, 3: 10, 4: 449}
    for doc_id, n in lens.items():
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        expect = 1 + max(0, -(-(n - 256) // 192))
        assert len(rows) == expect, (doc_id, len(rows), expect)
        for k, r in enumerate(rows):
            assert r.chunk_id == k and r.start_token == k * 192
            assert r.n_tokens == min(256, n - k * 192)
            assert r.first_token == f"t{k * 192}"
            assert r.last_token == f"t{min(k * 192 + 256, n) - 1}"
        # final window reaches the end exactly
        last = rows[-1]
        assert last.start_token + last.n_tokens == n
        # consecutive overlap is chunk - stride while full-sized
        for a, b in zip(rows, rows[1:]):
            assert (a.start_token + a.n_tokens) - b.start_token in (64, a.n_tokens - 192)
