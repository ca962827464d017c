"""North-star operator surface vs DuckDB oracle: text analysis, dedup
families, embedding similarity (SURVEY.md Phase 4 / BASELINE.json)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches

NORTHSTAR_ORACLED = [
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "dedup_exact_events",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "dedup_near_minhash",
    "simhash_near_dup_pairs",
    "embedding_topk_bruteforce",
    "embedding_near_dup_pairs",
    "word_count_topk",
    "minhash_signatures",
    "simhash_fingerprints",
    "multimodal_frame_sample",
    "lang_id_ngram",
    "corpus_sample_mix",
]


@pytest.mark.parametrize("name", NORTHSTAR_ORACLED)
def test_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


def test_minhash_finds_planted_near_dups(spark, sf_medium):
    """The testdata plants ~0.99-jaccard pairs; LSH must surface them."""
    from streaming_ml_with_ksql_spark import registry

    pairs = registry._REGISTRY["minhash_near_dup_pairs"].spark(spark, sf_medium)
    assert pairs.count() > 0
