"""Cross-engine POISON sweep (r13): the hygiene-hardened queries must
match their oracles on a corpus that actually contains the poison their
filters exist for — NULL rows, ragged rows, element-level NULL/NaN.

The r13 review observed that the hygiene predicates pass vacuously on
the shipped testdata (no poison rows exist at any sf); this fixture
injects every poison class into a copy of the sf0.01 embeddings table
and runs the full Spark-vs-DuckDB differential on it, so the
both-engines-filter-identically contract is continuously exercised
rather than asserted."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streaming_ml_with_ksql_spark.io import TABLES

from .oracle import assert_query_matches

HARDENED = [
    "embedding_topk_lsh",
    "embedding_topk_ivf",
    "embedding_topk_pq",
    "embedding_topk_ivfpq",
]


@pytest.fixture(scope="module")
def poisoned_sf(sf_medium, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("poison_sf")
    for t in TABLES:
        shutil.copy(f"{sf_medium}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(d / "embeddings.parquet")
    max_id = pa.compute.max(tbl["vec_id"]).as_py()
    dim = len(tbl["embedding"][0])
    base = [0.1] * (dim - 1)
    poison = pa.table(
        {
            "vec_id": pa.array(
                [max_id + i for i in range(1, 8)], type=tbl.schema[0].type
            ),
            "embedding": pa.array(
                [
                    None,  # NULL row
                    [0.25, -0.125, 0.5],  # ragged row
                    base + [float("nan")],  # NaN element
                    base + [None],  # NULL element
                    # ADVICE r13 low: +-Inf floor-casts to an undefined
                    # int64 in numpy while DuckDB raises on the BIGINT
                    # cast; huge finite magnitudes wrap int64
                    # squared-distance sums silently. All three must be
                    # dropped identically by the EMB_MAX_ABS bound.
                    base + [float("inf")],  # +Inf element
                    base + [float("-inf")],  # -Inf element
                    base + [4.0e5],  # finite but beyond EMB_MAX_ABS
                ],
                type=tbl.schema[1].type,
            ),
            "label": pa.array([0] * 7, type=tbl.schema[2].type),
        }
    )
    pq.write_table(
        pa.concat_tables([tbl, poison]), d / "embeddings.parquet"
    )
    return str(d)


@pytest.mark.parametrize("name", HARDENED)
def test_hardened_query_matches_oracle_on_poisoned_corpus(
    spark, poisoned_sf, name
):
    assert_query_matches(spark, name, poisoned_sf)


# Text queries with a defined degenerate-input contract, swept against a
# documents table poisoned with: empty text, whitespace-only text, NULL
# text, a 1-char doc, mixed-unicode + tab tokens, and a single 5000-char
# token. The first run of this sweep found two REAL latent divergences
# (lang_id: an all-NULL score chain fell through SQL's ELSE to 'fr'
# while Spark's when-chain stayed NULL; doc_fingerprint: DuckDB
# array_to_string([],'') is NULL where Spark concat_ws is '' — md5
# diverged NULL vs md5('')) — both fixed at the oracle boundary.
TEXT_SWEPT = [
    "text_stats",
    "lang_id",
    "lang_id_ngram",
    "doc_fingerprint",
    "token_budget",
    "doc_quality_score",
    "minhash_near_dup_pairs",
    "dedup_components",
    "corpus_clean_pipeline",
    "corpus_chunk_sliding",
    # r14: the token-deriving composites — Heaps checkpoints, the
    # dedup-aware split audit, the hash split, scrubbing and BPE all
    # consume empty/NULL/whitespace text through their own tokenizers.
    "heaps_vocab_growth",
    "split_leakage_audit",
    "corpus_hash_split",
    "pii_scrub",
    "bpe_tokenize_fixed",
]


@pytest.fixture(scope="module")
def poisoned_docs_sf(sf_medium, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("poison_docs_sf")
    for t in TABLES:
        shutil.copy(f"{sf_medium}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(d / "documents.parquet")
    max_id = pa.compute.max(tbl["doc_id"]).as_py()
    rows = [
        (max_id + 1, "", "en", "poison", 0),
        (max_id + 2, "    ", "en", "poison", 4),
        (max_id + 3, None, "en", "poison", None),
        (max_id + 4, "x", "en", "poison", 1),
        (max_id + 5, "ünïcødé tåken " * 3 + " tab\ttabs", "de", "poison", 60),
        (max_id + 6, "a" * 5000, "en", "poison", 5000),
    ]
    poison = pa.table(
        {
            name: pa.array([r[i] for r in rows], type=tbl.schema[i].type)
            for i, name in enumerate(
                ("doc_id", "text", "lang", "source", "n_chars")
            )
        }
    )
    pq.write_table(
        pa.concat_tables([tbl, poison]), d / "documents.parquet"
    )
    return str(d)


@pytest.mark.parametrize("name", TEXT_SWEPT)
def test_text_query_matches_oracle_on_poisoned_documents(
    spark, poisoned_docs_sf, name
):
    assert_query_matches(spark, name, poisoned_docs_sf)


# Core event queries swept against an events table poisoned with NULL
# user_id / event_type / value / props, a negative value, a zero value,
# and a malformed-JSON props string. First run found three more real
# divergences: quantile_sketch_events (a NULL value's NULL bucket orders
# FIRST in Spark's cumulative window but LAST in DuckDB's, shifting
# every cum count — fixed by dropping NULL values at the sketch
# boundary on both sides), json_extract_props (Spark returns NULL on
# malformed JSON, DuckDB json_extract_string raises — fixed with a
# json_valid oracle guard), and value_outliers_zscore's DECIMAL(18,6)
# input domain (documented: |value| >= 1e12 raises LOUDLY AND
# SYMMETRICALLY on both engines — (18,6)^2 is the largest square inside
# Spark's 38-digit cap, so the width is not widenable for free; such a
# value is therefore NOT planted here).
EVENTS_SWEPT = [
    "hopping_window_agg",
    "tumbling_window_agg",
    "rolling_counts",
    "distinct_users",
    "latest_per_key",
    "heavy_hitters_users",
    "user_event_type_diversity",
    "case_when_indicators",
    "event_type_week_pivot",
    "json_extract_props",
    "quantile_sketch_events",
    "value_outliers_zscore",
]


@pytest.fixture(scope="module")
def poisoned_events_sf(sf_medium, tmp_path_factory) -> str:
    import datetime

    d = tmp_path_factory.mktemp("poison_events_sf")
    for t in TABLES:
        shutil.copy(f"{sf_medium}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(d / "events.parquet")
    max_id = pa.compute.max(tbl["event_id"]).as_py()
    ts0 = datetime.datetime(2024, 1, 15, 12, 0, 0)
    rows = [
        (max_id + 1, ts0, None, "view", 1.5, '{"k":1}'),
        (max_id + 2, ts0, 7, None, 2.5, '{"k":1}'),
        (max_id + 3, ts0, 7, "view", None, '{"k":1}'),
        (max_id + 4, ts0, 7, "view", -3.25, None),
        (max_id + 5, ts0, 7, "view", 0.0, "not json"),
    ]
    poison = pa.table(
        {
            n: pa.array([r[i] for r in rows], type=tbl.schema[i].type)
            for i, n in enumerate(tbl.schema.names)
        }
    )
    pq.write_table(pa.concat_tables([tbl, poison]), d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("name", EVENTS_SWEPT)
def test_event_query_matches_oracle_on_poisoned_events(
    spark, poisoned_events_sf, name
):
    assert_query_matches(spark, name, poisoned_events_sf)


# r14 (VERDICT r13 #6): the TPC-H star schema was unswept. The orders /
# lineitem / customer copies are poisoned with NULL join keys (l_orderkey,
# o_custkey, c_nationkey), an orphan FK (o_custkey -> no customer; the
# poison lineitems' orderkey -> no order), NULL / negative / zero measures
# (quantity, extendedprice, totalprice, acctbal), NULL group keys
# (returnflag, linestatus, orderpriority, mktsegment) and NULL dates —
# every class an ingest pipeline actually produces. Each swept query must
# agree with its DuckDB oracle on the poisoned star, which exercises both
# engines' NULL-key join semantics, NULL-group aggregation and NULL
# ordering contracts.
TPCH_SWEPT = [
    "pricing_summary",
    "returnflag_rollup",
    "order_priority_cube",
    "order_grouping_sets",
    "top_orders_per_customer",
    "customers_without_orders",
    "orders_above_customer_avg",
    "local_supplier_volume",
    "disjunctive_revenue",
    "volume_shipping",
    "top_revenue_supplier",
    "order_value_percentiles",
    "shipping_priority",
    "excess_part_suppliers",
    "waiting_suppliers",
]

# CDC semantics ride the customer table (envelope synthesis + SCD2 +
# snapshot diff): NULL attribute columns and a NULL business key flow
# through the changelog builders on both engines.
CDC_SWEPT = [
    "scd2_customer_history",
    "cdc_snapshot_customers",
    "streaming_cdc_upsert",
]


@pytest.fixture(scope="module")
def poisoned_tpch_sf(sf_medium, tmp_path_factory) -> str:
    import datetime

    d = tmp_path_factory.mktemp("poison_tpch_sf")
    for t in TABLES:
        shutil.copy(f"{sf_medium}/{t}.parquet", d / f"{t}.parquet")
    ts = datetime.datetime(1995, 6, 15, 0, 0, 0)

    li = pq.read_table(d / "lineitem.parquet")
    max_ok = pa.compute.max(li["l_orderkey"]).as_py()
    li_rows = [
        # (okey, pkey, skey, lineno, qty, price, disc, tax, rf, ls, ship)
        (max_ok + 1, 1, 1, 1, None, 100.0, 0.05, 0.02, "N", "O", ts),
        (max_ok + 2, 1, 1, 1, -5.0, 100.0, 0.05, 0.02, "N", "O", ts),
        (max_ok + 3, 1, 1, 1, 5.0, 0.0, 0.0, 0.0, None, None, ts),
        (max_ok + 4, None, None, 2, 5.0, 100.0, None, None, "A", "F", None),
        (None, 1, 1, 1, 1.0, 50.0, 0.1, 0.0, "R", "F", ts),
    ]
    li_poison = pa.table(
        {
            n: pa.array([r[i] for r in li_rows], type=li.schema[i].type)
            for i, n in enumerate(li.schema.names)
        }
    )
    pq.write_table(pa.concat_tables([li, li_poison]), d / "lineitem.parquet")

    orders = pq.read_table(d / "orders.parquet")
    max_ok = pa.compute.max(orders["o_orderkey"]).as_py()
    o_rows = [
        # (okey, custkey, status, total, date, priority)
        (max_ok + 1, None, "O", 100.0, ts, "1-URGENT"),
        (max_ok + 2, 999999999, "O", 200.0, ts, "2-HIGH"),
        (max_ok + 3, 1, None, None, None, None),
        (max_ok + 4, 1, "F", -50.0, ts, "5-LOW"),
    ]
    o_poison = pa.table(
        {
            n: pa.array([r[i] for r in o_rows], type=orders.schema[i].type)
            for i, n in enumerate(orders.schema.names)
        }
    )
    pq.write_table(pa.concat_tables([orders, o_poison]), d / "orders.parquet")

    cust = pq.read_table(d / "customer.parquet")
    max_ck = pa.compute.max(cust["c_custkey"]).as_py()
    c_rows = [
        # (custkey, name, nationkey, acctbal, mktsegment)
        (max_ck + 1, None, None, None, None),
        (max_ck + 2, "Customer#poison", 0, -999.25, "BUILDING"),
    ]
    c_poison = pa.table(
        {
            n: pa.array([r[i] for r in c_rows], type=cust.schema[i].type)
            for i, n in enumerate(cust.schema.names)
        }
    )
    pq.write_table(pa.concat_tables([cust, c_poison]), d / "customer.parquet")
    return str(d)


@pytest.mark.parametrize("name", TPCH_SWEPT)
def test_tpch_query_matches_oracle_on_poisoned_star(
    spark, poisoned_tpch_sf, name
):
    assert_query_matches(spark, name, poisoned_tpch_sf)


@pytest.mark.parametrize("name", CDC_SWEPT)
def test_cdc_query_matches_oracle_on_poisoned_customers(
    spark, poisoned_tpch_sf, name
):
    assert_query_matches(spark, name, poisoned_tpch_sf)


# Streaming twins replay the SAME poisoned parquet through micro-batch
# drains — state-commit boundaries must not change any contract the batch
# oracle states (VERDICT r13 #6: "the streaming twins are unswept").
STREAMING_EVENTS_SWEPT = [
    "streaming_hopping_window",
    "streaming_latest_per_key",
    "streaming_incremental_dedup",
    "streaming_hll_registers",
    "streaming_cms_cells",
    # first run found streaming_transition_matrix minting a literal
    # 'None' event type (str(None) in the state kernel) — two phantom
    # groups vs the batch lag oracle; fixed in stateful.py + the
    # registered aggregation's prev_type IS NOT NULL mirror.
    "streaming_transition_matrix",
    "streaming_sessionize",
    "streaming_threshold_alert",
    "streaming_quantile_sketch",
    "streaming_wallet_balance",
    "streaming_kmv_ingest",
    "streaming_dedup_exact",
]

STREAMING_DOCS_SWEPT = [
    "streaming_gopher_filter",
    "streaming_corpus_ingest",
    "streaming_column_profile",
]


@pytest.mark.parametrize("name", STREAMING_EVENTS_SWEPT)
def test_streaming_twin_matches_oracle_on_poisoned_events(
    spark, poisoned_events_sf, name
):
    assert_query_matches(spark, name, poisoned_events_sf)


@pytest.mark.parametrize("name", STREAMING_DOCS_SWEPT)
def test_streaming_twin_matches_oracle_on_poisoned_documents(
    spark, poisoned_docs_sf, name
):
    assert_query_matches(spark, name, poisoned_docs_sf)
