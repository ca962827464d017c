"""Spark-vs-DuckDB oracle sweep for every round-7d/7e registered query
(r7 ADVICE: 32 of the 38 new equalities had no automated regression
check — the driver verifies only the first 50 DRIVER_PRIORITY entries
and test_northstar covers only older rounds). Batch queries run at
sf0.01 like test_beyond; the streaming replay twins run at sf0.001."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches

ROUND7DE = [
    # q12_round7d
    "arrow_ipc_source_roundtrip",
    "rrf_hybrid_retrieval",
    "did_promo_effect",
    "hits_customer_part",
    "halflife_decayed_value",
    "dtw_revenue_align",
    "kmv_distinct_users",
    "jl_projection_embed",
    "mmr_diverse_retrieval",
    "rake_keyphrases",
    "fifo_lot_allocation",
    "shapley_channel_attribution",
    "t_closeness_report",
    "multimodal_mulaw_transcode",
    # q13_round7e
    "conformal_forecast_interval",
    "cuped_adjusted_lift",
    "multimodal_tiff_decode",
    "compaction_bin_packing",
    "hll_estimate_accuracy",
    "naive_bayes_event_type",
    "target_encode_loo",
    "mahalanobis_order_outliers",
    "wilson_topk_parts",
    "markov_next_event_accuracy",
    "ransac_daily_trend",
    "postings_delta_varint",
    "reuse_distance_histogram",
    "degree_assortativity",
    "wire_format_gauntlet",
    "multimodal_hist_equalize",
    "winnowing_fingerprint_pairs",
    "randomization_test_weekend_value",
    "wasserstein_weekend_value",
    "latency_hdr_histogram",
    "rapid_repeat_screen",
    "ktruss_copurchase_peel",
]

ROUND7DE_STREAMING = [
    "streaming_kmv_ingest",
    "streaming_wasserstein_ingest",
]


@pytest.mark.parametrize("name", ROUND7DE)
@pytest.mark.sweep
def test_round7de_query_matches_oracle(spark, sf_medium, name):
    assert_query_matches(spark, name, sf_medium)


@pytest.mark.parametrize("name", ROUND7DE_STREAMING)
@pytest.mark.sweep
def test_round7de_streaming_matches_oracle(spark, sf_small, name):
    assert_query_matches(spark, name, sf_small)
