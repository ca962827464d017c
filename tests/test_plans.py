"""Physical-plan quality gates (the 100 TB discipline, SURVEY.md §6-7).

Correct results are necessary, not sufficient: these tests pin the plan
*shapes* that make the operators scale — predicate pushdown reaching the
parquet scan, column pruning, broadcast joins for bounded dimensions,
map-side partial aggregation before every shuffle, and the as-of join's
single-shuffle merge (no nested-loop range join). A regression here means
the query still passes its oracle but would fall over at 1000× the data.
"""

from __future__ import annotations

import re

from streaming_ml_with_ksql_spark import registry

SF = "/root/testdata/sf0.001"


def _explain(spark, name: str, mode: str = "formatted") -> str:
    df = registry._REGISTRY[name].spark(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_pushdown_and_column_pruning(spark):
    plan = _explain(spark, "projection_filter_cast")
    pushed = re.search(r"PushedFilters: \[(.+?)\]", plan)
    assert pushed and "GreaterThan(l_discount" in pushed.group(1)
    schema = re.search(r"ReadSchema: struct<(.+?)>", plan)
    # pruned scan: only the referenced columns, not lineitem's 16
    assert schema and len(schema.group(1).split(",")) <= 7
    assert "l_comment" not in schema.group(1)


def test_enrich_join_broadcasts_dimension(spark):
    plan = _explain(spark, "enriched_window_join", "simple")
    assert "BroadcastHashJoin" in plan
    # the fact side must not be re-shuffled for the join: the only exchanges
    # are the aggregation's hash partitioning and the broadcast itself
    exchanges = [
        l for l in plan.splitlines() if "Exchange" in l and "Broadcast" not in l
    ]
    assert len(exchanges) <= 1, exchanges


def test_hopping_agg_has_map_side_partial(spark):
    plan = _explain(spark, "hopping_window_agg", "simple")
    assert "partial_min" in plan and "partial_sum" in plan
    # exactly one shuffle: the (window, user_id) hash partitioning
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_is_single_shuffle_merge(spark):
    plan = _explain(spark, "asof_view_attribution", "simple")
    # no quadratic fallback
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # one shuffle on the key feeding one ordered window pass over the union
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" in plan and "Window" in plan


def test_rolling_counts_single_shuffle(spark):
    plan = _explain(spark, "rolling_counts", "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_scans_prune_events_columns(spark):
    """distinct_users must scan only user_id, not the whole events row."""
    plan = _explain(spark, "distinct_users")
    schema = re.search(r"ReadSchema: struct<(.+?)>", plan)
    assert schema and schema.group(1).split(",") == ["user_id:bigint"]


def test_whole_stage_codegen_on_flagship(spark):
    # AQE wraps the plan until execution, hiding codegen spans — probe with
    # AQE off (plan shape, not runtime behavior, is what's under test)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _explain(spark, "hopping_window_agg", "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    assert m and int(m.group(1)) >= 1


def test_embedding_near_dup_no_all_pairs_join(spark):
    """Neither registered near-dup form may contain an all-pairs join node:
    the dense path is a joinless broadcast-tile GEMM scan, the LSH path a
    (table_id, bucket) equi-join."""
    for q in ("embedding_near_dup_pairs", "embedding_near_dup_pairs_lsh"):
        plan = _explain(spark, q, "simple")
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_minhash_no_python_in_hot_path(spark):
    """The MinHash pipeline must stay JVM-side: no Python eval nodes."""
    plan = _explain(spark, "minhash_near_dup_pairs", "simple")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bucketed_join_has_no_exchange_on_join_key(spark):
    """The co-located join's whole point: bucketed layouts make the
    SortMergeJoin exchange-free — the only shuffle left in the query is
    the final (tiny) group-by key, never the join key."""
    plan = _explain(spark, "bucketed_colocated_join", "simple")
    assert "SortMergeJoin" in plan
    for key in ("o_custkey", "c_custkey"):
        assert not re.search(rf"Exchange hashpartitioning\({key}", plan), key


def test_partitioned_sink_read_prunes_partitions(spark):
    """The day-partitioned read-back must carry the date predicate as a
    PartitionFilter (directory pruning at planning time), not a post-scan
    data filter over every file."""
    plan = _explain(spark, "partitioned_sink_prune", "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_day" in m.group(1), plan[:2000]


def test_bloom_pruned_join_filters_before_exchange(spark):
    """The bloom membership test must sit below the join's Exchange —
    pruning before the shuffle is the operator's entire point."""
    plan = _explain(spark, "bloom_pruned_join", "simple")
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    exchange_pos = plan.find("Exchange")
    filter_pos = plan.rfind("Filter")
    assert exchange_pos != -1 and filter_pos > exchange_pos, plan[:2000]


def test_forecast_revenue_scan_is_the_query(spark):
    """Q6 shape: all three predicates reach the parquet reader and the scan
    reads only the referenced columns; the aggregate partials map-side."""
    plan = _explain(spark, "forecast_revenue")
    pushed = re.search(r"PushedFilters: \[(.+?)\]", plan)
    assert pushed, plan[:1500]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed.group(1), frag
    schema = re.search(r"ReadSchema: struct<(.+?)>", plan)
    assert schema and len(schema.group(1).split(",")) <= 4
    assert "partial_sum" in plan


def test_returned_item_topk_uses_heap_not_global_sort(spark):
    """Q10's top-k must be TakeOrderedAndProject (per-partition heaps), not
    a global Sort feeding a Limit."""
    plan = _explain(spark, "returned_item_topk", "simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_disjunctive_revenue_single_join(spark):
    """Q19's OR-of-ANDs must stay ONE broadcast hash join + one filter —
    not a union of three joins, not a nested loop."""
    plan = _explain(spark, "disjunctive_revenue", "simple")
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Union" not in plan


def test_ngram_lm_score_stays_jvm(spark):
    """Bigram construction and the model joins must never cross into
    Python — in-row transform/explode plus JVM joins only."""
    plan = _explain(spark, "ngram_lm_score", "simple")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_market_share_no_cartesian_and_broadcast_dims(spark):
    plan = _explain(spark, "market_share", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_bucket_join_avoids_nested_loop(spark):
    """The keyless interval-containment join must run as a bucket
    equi-join + filter — never the BroadcastNestedLoopJoin Catalyst
    would pick for a pure range predicate."""
    plan = _explain(spark, "hot_window_events", "simple")
    # the fact×interval containment must be an equi-join on the bucket id
    assert re.search(r"(BroadcastHash|ShuffledHash|SortMerge)Join \[__bucket", plan)
    # the only nested-loop allowed is the 1-row scalar-stats attach
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_zorder_colocates_both_dimensions(spark):
    """Sorting by zindex must bound the per-block value spread in BOTH
    dimensions, where a single-column sort leaves the other dimension at
    ~full range per block — the property that makes min/max file stats
    prune scans on either column."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import bucketing

    # Same construction as the registered query, but keeping (t, p) in the
    # frame — joining the query output back on (l_orderkey, l_linenumber)
    # would multiply rows: that pair is NOT unique in the synthetic data.
    li = io_mod.load_table(spark, SF, "lineitem").select(
        F.unix_micros("l_shipdate").alias("t"),
        F.col("l_partkey").alias("p"),
    )
    rng = li.agg(
        F.min("t").alias("tlo"), F.max("t").alias("thi"),
        F.min("p").alias("plo"), F.max("p").alias("phi"),
    )
    joined = bucketing.zorder_index(
        li.crossJoin(F.broadcast(rng)),
        F.col("t"), F.col("p"),
        a_min=F.col("tlo"), a_max=F.col("thi"),
        b_min=F.col("plo"), b_max=F.col("phi"),
    ).select("t", "p", "zindex")

    def block_spread(df, order_col):
        w = Window.orderBy(order_col, "t", "p")
        blocks = df.withColumn(
            "blk", ((F.row_number().over(w) - 1) / 256).cast("long")
        )
        return (
            blocks.groupBy("blk")
            .agg(
                (F.max("t") - F.min("t")).alias("st"),
                (F.max("p") - F.min("p")).alias("sp"),
            )
            .agg(F.avg("st").alias("st"), F.avg("sp").alias("sp"))
            .collect()[0]
        )

    z_spread = block_spread(joined, "zindex")
    t_spread = block_spread(joined, "t")
    # single-column time sort: part key spread per block is ~full range
    # (measured 198/199); z-order cuts it several-fold (measured 74) while
    # keeping time spread a bounded fraction of the range (measured ~27%
    # at ~23 blocks — both-dims locality, which no lexicographic sort has)
    assert z_spread.sp < 0.5 * t_spread.sp
    assert z_spread.st < 0.4 * (
        joined.agg(F.max("t") - F.min("t")).collect()[0][0]
    )


def test_point_in_time_join_is_keyed_not_nested_loop(spark):
    """The temporal join must hash/merge on the customer key with the
    validity range as a join filter — never a nested loop over versions."""
    plan = _explain(spark, "point_in_time_join", "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(BroadcastHash|ShuffledHash|SortMerge)Join", plan)


def test_ivf_plan_size_independent_of_centroid_count(spark):
    """Centroids must enter the search plan as broadcast relation DATA, not
    as unrolled Catalyst literals — otherwise a realistic 4k-65k-centroid
    index makes the plan itself tens of MB and analysis time explodes. The
    analyzed plan must not grow with n_centroids (beyond noise)."""
    import os

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import similarity

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    emb = io_mod.load_table(spark, sf_dir, "embeddings")
    sizes = {}
    for k in (4, 32):
        df = similarity.ivf_topk(emb, n_centroids=k, n_probe=2)
        sizes[k] = len(str(df._jdf.queryExecution().analyzed()))
    # 8x the centroids must not even double the plan text (literal unrolling
    # would scale it ~8x: 32 centroids x 64 dims of double literals)
    assert sizes[32] < 2 * sizes[4], sizes


def test_bpe_expression_path_stays_jvm(spark):
    """The fixed-merge BPE tokenizer must be pure whole-stage-codegen:
    no Python evaluation node anywhere (every merge is a JVM replace()),
    one scan of only the needed columns, map-side partial aggregation."""
    plan = _explain(spark, "bpe_tokenize_fixed")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    schema = re.search(r"ReadSchema: struct<(.+?)>", plan)
    assert schema and set(schema.group(1).split(",")) <= {
        "doc_id:bigint",
        "text:string",
    }


def test_jpeg_decode_is_narrow_map(spark):
    """Codec kernels are narrow Arrow maps: the ONLY exchange allowed is
    the CPU-aware round-robin fan-out of the 8-byte doc_ids BEFORE the
    encode kernel — payload bytes, once synthesized, must never
    shuffle."""
    plan = _explain(spark, "multimodal_jpeg_decode", "simple")
    assert "MapInPandas" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1 and "RoundRobin" in exchanges[0], exchanges
    # the fan-out sits below the payload synthesis: nothing between the
    # two MapInPandas stages shuffles
    assert plan.index("Exchange") > plan.rindex("MapInPandas")


def test_star_contraction_edges_stay_partitioned(spark):
    """The star algorithm's output over the sf0.001 near-dup graph must
    come from the measured tiny loop width (no 32-wide shuffles of a
    KB-sized label frame), like the propagation loop before it."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as sio
    from streaming_ml_with_ksql_spark.operators import graph, text

    docs = sio.load_table(spark, SF, "documents")
    pairs = text.ngram_jaccard_pairs(docs)
    st: dict = {}
    comp = graph.connected_components(
        pairs,
        docs.select("doc_id"),
        src="doc_a",
        dst="doc_b",
        id_col="doc_id",
        algorithm="star",
        stats=st,
    )
    # the final resolve join sees the checkpointed 1-partition label RDD
    plan = spark._jvm.PythonSQLUtils.explainString(
        comp._jdf.queryExecution(), "formatted"
    )
    assert "Scan ExistingRDD" in plan
    assert st == {} or st.get("rounds", 0) <= 6  # dense blobs converge fast


def test_quantile_sketch_partial_agg_and_pruned_scan(spark):
    """The quantile sketch's one real shuffle carries (event_type, bucket)
    partial counts — map-side combined — and the scan reads ONLY the two
    columns the sketch needs; the estimator's windows run over the
    bounded cell table, never raw rows."""
    plan = _explain(spark, "quantile_sketch_events")
    assert "partial_count" in plan or "partial count" in plan.lower()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(
        c.split(":")[0] for c in m.group(1).split(",")
    ) == {"event_type", "value"}, m.group(0) if m else plan[:400]


def test_mjpg_frame_decode_is_narrow_map(spark):
    """Same discipline as the JPEG codec: ONE round-robin fan-out of the
    8-byte ids before synthesis; the AVI payloads and their decoded
    frames never shuffle."""
    plan = _explain(spark, "multimodal_mjpg_frame_decode", "simple")
    assert "MapInPandas" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1 and "RoundRobin" in exchanges[0], exchanges


def test_round6_operators_plan_shapes(spark):
    """Round-6 additions keep the scale discipline:
    - stratified_sample: no join anywhere — one hash projection, one
      shuffle for the per-stratum rank window;
    - touch_attribution: user-keyed equi-join, never a time-range
      nested loop; the two windows share one (purchase_id) shuffle;
    - term_postings_index: joinless — dictionary filter is a literal
      IN over the exploded tokens, one aggregation shuffle;
    - embedding_scale_features: the dim-sized moment table broadcasts
      back onto the components (no shuffled join of the corpus side)."""
    plan = _explain(spark, "stratified_sample_documents", "simple")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1

    plan = _explain(spark, "touch_attribution", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # join shuffle on user_id + one shared window shuffle on purchase_id
    assert plan.count("Exchange hashpartitioning") <= 3

    plan = _explain(spark, "term_postings_index", "simple")
    assert "Join" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle

    plan = _explain(spark, "embedding_scale_features", "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_search_is_cogrouped_not_collected(spark):
    """The ANN serving path (VERDICT r5 #4): pq/ivfpq search plans must
    carry the cogrouped Arrow scan (FlatMapCoGroupsInPandas) and no
    cartesian anything — the query frame streams through executors."""
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import similarity

    emb = io_mod.load_table(spark, SF, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = base.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    for df in (
        similarity.pq_search(similarity.build_pq_index(base), queries),
        similarity.ivfpq_search(similarity.build_ivfpq_index(base), queries),
    ):
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert "FlatMapCoGroupsInPandas" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_pairs_and_gdpr_plan_shapes(spark):
    """image_near_dup_pairs_dhash candidates come from band equi-joins
    (never a cartesian/nested-loop pair scan); gdpr_purge_audit's fact
    scans ride broadcast left-semi joins on the bounded key relations."""
    plan = _explain(spark, "image_near_dup_pairs_dhash", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = _explain(spark, "gdpr_purge_audit", "simple")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_deglobalized_sorts_round7(spark):
    """VERDICT r6 #2/#3: the two queries that carried global
    unpartitioned sort-windows now scale.
    - customer_rfm_segments: quintiles via operators.rank (range shuffle
      + broadcast offsets) — NO WindowExec anywhere in the plan;
    - series_pattern_match / session_event_paths: global top-10 via
      orderBy+limit → TakeOrderedAndProject (per-partition top-k, driver
      merges 10 rows); the rnk window rides the 10-row result behind a
      constant partition key, so no partition-less WindowExec remains."""
    plan = _explain(spark, "customer_rfm_segments", "simple")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan

    for name in ("series_pattern_match", "session_event_paths"):
        plan = _explain(spark, name, "simple")
        assert "TakeOrderedAndProject" in plan, name
        # the only Window nodes are the user-keyed upstream passes; the
        # rnk column rides monotonically_increasing_id over the 10-row
        # limit result, never a partition-less window
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                assert "windowspecdefinition(user_id" in line, line


def test_round7_analytics_plan_shapes(spark):
    """Round-7 operators: equi-join/broadcast shapes, no corpus-sized
    single-partition windows, top-k via TakeOrderedAndProject."""
    # transition matrix: per-user lag window + broadcast of the tiny
    # per-prev totals — no cartesian, no partition-less window
    plan = _explain(spark, "event_transition_matrix", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    # MAD outliers: two broadcast stat joins onto the corpus — the events
    # themselves never shuffle
    plan = _explain(spark, "mad_outliers_values", "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2

    # TF-IDF: the top-k window is hash-partitioned BY DOCUMENT (the
    # only SinglePartition exchanges are the 1-row scalar count
    # aggregates, which Window never consumes)
    plan = _explain(spark, "tfidf_top_terms", "formatted")
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(doc_id" in plan
    # Spark pushes the rnk<=3 filter into per-group top-k limits
    # (Partial before the shuffle, Final after) — keep that plan
    assert plan.count("WindowGroupLimit") >= 2

    # copurchase: the pair stage is an EQUI-join on the order key (the
    # part_a < part_b predicate rides it as a filter); the only nested
    # loop is the 1-row scalar-total broadcast
    plan = _explain(spark, "copurchase_lift", "simple")
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan

    # collocations + weighted sample: global top-k is TakeOrderedAndProject
    for q in ("bigram_collocations", "weighted_sample_documents"):
        plan = _explain(spark, q, "simple")
        assert "TakeOrderedAndProject" in plan

    # AB test / calibration: pure aggregation pipelines — no join at all
    for q in ("ab_test_lift", "score_calibration_bins"):
        plan = _explain(spark, q, "simple")
        assert "Join" not in plan or "BroadcastHashJoin" in plan


def test_round7b_plan_shapes(spark):
    """Round-7 continuation operators: partitioned windows, broadcast
    joins, narrow codec maps."""
    # clamped balance: BOTH window passes partition by user — a
    # partition-less window spec (one that starts straight at the
    # ORDER BY list) must not exist anywhere in the plan
    plan = _explain(spark, "clamped_running_balance", "formatted")
    assert "windowspecdefinition(user_id" in plan
    assert "windowspecdefinition(ts" not in plan
    assert "CartesianProduct" not in plan

    # isotonic: every join over the month-bounded daily frame is a
    # broadcast; the corpus-side aggregation happens before any join
    plan = _explain(spark, "isotonic_daily_trend", "simple")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastExchange") >= 2

    # GIF: same narrow-map contract as the JPEG/PNG codecs — one
    # round-robin fan-out below the encode kernel, nothing after the
    # payload synthesis shuffles
    plan = _explain(spark, "multimodal_gif_decode", "simple")
    assert "MapInPandas" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1 and "RoundRobin" in exchanges[0], exchanges

    # msgpack roundtrip: two narrow Arrow maps, no shuffle at all
    plan = _explain(spark, "msgpack_source_roundtrip", "simple")
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan

    # l-diversity: pure partial-aggregated groupBy, no join
    plan = _explain(spark, "l_diversity_report", "simple")
    assert "Join" not in plan


def test_kmeans_and_bfs_loop_plan_shapes(spark):
    """Iterative operators: the per-iteration frames are
    localCheckpointed (lineage truncation), assignment broadcasts the
    k-row centroid side, and the final plans contain no cartesian pair
    scan over points x points."""
    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import clustering, graph

    emb = io_mod.load_table(spark, SF, "embeddings")
    asg = clustering.kmeans_fixed_point(emb, k=5, iters=1)
    plan = spark._jvm.PythonSQLUtils.explainString(
        asg._jdf.queryExecution(), "simple"
    )
    # the ONLY nested-loop is the deliberate k-row centroid broadcast
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # lineage truncated: the plan reads the checkpointed RDDs, not the
    # full iterative DAG back to parquet
    assert "Scan ExistingRDD" in plan

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    dist = graph.bfs_hops(pairs, seed_mod=7, iters=2)
    plan = spark._jvm.PythonSQLUtils.explainString(
        dist._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_round7c_plan_shapes(spark):
    """Third-continuation operators: DBSCAN stays on key joins over the
    checkpointed pair graph, Holt is one bounded aggregate (no window,
    no join), BSON is two narrow Arrow maps with no shuffle."""
    # DBSCAN: no cartesian pair scan; the eps-graph comes from the
    # checkpointed GEMM frame (Scan ExistingRDD), everything after is
    # key joins/aggregations
    plan = _explain(spark, "dbscan_embedding_clusters", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan

    # Holt: the fold input is ONE collected-list row — a bounded
    # two-phase aggregate; no window function, no join anywhere
    plan = _explain(spark, "holt_forecast_revenue", "simple")
    assert "Join" not in plan
    assert "Window" not in plan

    # BSON roundtrip: two narrow Arrow maps, no shuffle at all (the
    # msgpack contract)
    plan = _explain(spark, "bson_source_roundtrip", "simple")
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan


def test_round7d_plan_shapes(spark):
    """Fourth-continuation operators keep the 100 TB shapes: wire codecs
    are narrow Arrow maps, every global top-N is TakeOrderedAndProject
    (never a partition-less sort window), loops run on checkpointed
    bounded frames, and per-key rank windows never single-partition."""
    # Arrow IPC roundtrip: two narrow Arrow maps, zero shuffle
    plan = _explain(spark, "arrow_ipc_source_roundtrip", "simple")
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan

    # mu-law transcode: one kernel behind the round-robin fan-out only
    plan = _explain(spark, "multimodal_mulaw_transcode", "simple")
    assert "MapInPandas" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    ]
    # at sf0.001 the size-aware fan-out computes a single task, planned
    # as REPARTITION_BY_NUM; at real SFs it is the RoundRobin fan-out —
    # either way a repartition, never a hash/broadcast shuffle
    assert len(exchanges) == 1 and (
        "RoundRobin" in exchanges[0] or "REPARTITION_BY_NUM" in exchanges[0]
    ), exchanges

    # RRF: list cuts and the fused top-k are TakeOrderedAndProject;
    # no window function anywhere (ranks attach on the k-row results)
    plan = _explain(spark, "rrf_hybrid_retrieval", "simple")
    assert plan.count("TakeOrderedAndProject") >= 3
    assert "Window" not in plan

    # HITS: per-round frames are checkpointed (Scan ExistingRDD), the
    # two side rankings are TakeOrderedAndProject, no global sort window
    plan = _explain(spark, "hits_customer_part", "simple")
    assert "Scan ExistingRDD" in plan
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "Window" not in plan

    # DTW: a bounded one-row fold chain — no join, no window
    plan = _explain(spark, "dtw_revenue_align", "simple")
    assert "Join" not in plan
    assert "Window" not in plan

    # KMV: the rank window partitions BY KEY — no single-partition
    # exchange anywhere
    plan = _explain(spark, "kmv_distinct_users", "simple")
    assert "SinglePartition" not in plan

    # RAKE: per-(doc,word)/(doc,phrase) aggregates and a per-doc rank
    # window — never a global sort
    plan = _explain(spark, "rake_keyphrases", "simple")
    assert "SinglePartition" not in plan

    # FIFO allocation: the overlap join rides the l_partkey equi-key —
    # no nested loop, no cartesian
    plan = _explain(spark, "fifo_lot_allocation", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # Shapley: the pre-purchase touch join is keyed on user_id
    plan = _explain(spark, "shapley_channel_attribution", "simple")
    assert "CartesianProduct" not in plan

    # MMR: greedy loop runs on the checkpointed candidate frame
    plan = _explain(spark, "mmr_diverse_retrieval", "simple")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan

    # half-life decay: map-side partial aggregation before the per-user
    # shuffle
    plan = _explain(spark, "halflife_decayed_value", "simple")
    assert "partial_sum" in plan


def test_round7d_second_wave_plan_shapes(spark):
    """Second-wave operators: top-Ns stay TakeOrderedAndProject, the
    encoders broadcast their dictionary aggregates, the compaction fold
    and conformal split have no sort windows."""
    for name in (
        "mahalanobis_order_outliers",
        "wilson_topk_parts",
        "conformal_forecast_interval",
    ):
        plan = _explain(spark, name, "simple")
        assert "TakeOrderedAndProject" in plan, name
        assert "Window" not in plan, name

    plan = _explain(spark, "target_encode_loo", "simple")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan

    plan = _explain(spark, "compaction_bin_packing", "simple")
    assert "Join" not in plan and "Window" not in plan

    # Naive Bayes: scoring happens on broadcast-joined dictionary
    # frames; the only sort window partitions by the 28-cell grid
    plan = _explain(spark, "naive_bayes_event_type", "simple")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan

    # HLL estimator: the register fold adds no join beyond the exact
    # count; no global sort anywhere
    plan = _explain(spark, "hll_estimate_accuracy", "simple")
    assert "Window" not in plan


def test_round7d_third_wave_plan_shapes(spark):
    """Later-wave operators: fingerprint joins stay keyed, per-key
    windows never single-partition, loops run on checkpointed frames."""
    plan = _explain(spark, "winnowing_fingerprint_pairs", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # the lag windows partition BY KEY (hash exchange feeds Window);
    # the only single-partition exchange allowed is the ~22-cell
    # histogram-total aggregate in the HDR query
    for name in ("latency_hdr_histogram", "rapid_repeat_screen"):
        plan = _explain(spark, name, "simple")
        assert "Window" in plan and "Exchange hashpartitioning" in plan, name
    assert "SinglePartition" not in _explain(spark, "rapid_repeat_screen", "simple")

    plan = _explain(spark, "ktruss_copurchase_peel", "simple")
    assert "Scan ExistingRDD" in plan  # peeled frames are checkpointed
    assert "CartesianProduct" not in plan

    # randomization test: the 200-perm fan-out rides a broadcast of the
    # calendar-bounded daily aggregate — no corpus-wide cross join
    plan = _explain(spark, "randomization_test_weekend_value", "simple")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan

    # gauntlet: eight narrow Arrow maps, zero shuffle
    plan = _explain(spark, "wire_format_gauntlet", "simple")
    assert plan.count("MapInPandas") == 8
    assert "Exchange" not in plan
